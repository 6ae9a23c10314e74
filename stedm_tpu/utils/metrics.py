"""Segmentation losses and confusion-matrix metrics as pure functions.

Functional ports of the reference's metric stack (reference `modules/utils.py` and
`modules/segmentation.py`): CE + Dice composite loss, global / per-patient /
per-subtype confusion matrices, IoU and Dice derived from CMs. On TPU the CMs are
plain [C, C] arrays accumulated with scatter-adds inside jit and psum-reduced across
the mesh — the torchmetrics sync-on-compute equivalent.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def dice_loss(probs: jnp.ndarray, one_hot: jnp.ndarray, eps: float = 0.01) -> jnp.ndarray:
    """Soft Dice over (batch, H, W) per class, averaged over classes 1..C-1
    (reference modules/utils.py:8-18). Inputs are NHWC."""
    dims = (0, 1, 2)
    probs = probs.astype(jnp.float32)
    one_hot = one_hot.astype(jnp.float32)
    intersection = jnp.sum(probs * one_hot, axis=dims)
    dice = (2 * intersection + eps) / (jnp.sum(one_hot, axis=dims)
                                       + jnp.sum(probs, axis=dims) + eps)
    return jnp.mean(1.0 - dice[1:])


def cross_entropy(logits: jnp.ndarray, one_hot: jnp.ndarray) -> jnp.ndarray:
    """torch CrossEntropyLoss with probability targets: mean over pixels of
    -sum_c p_c log softmax_c (reference modules/segmentation.py:45-47)."""
    import jax.nn

    log_softmax = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -(one_hot.astype(jnp.float32) * log_softmax).sum(-1).mean()


def seg_loss(logits: jnp.ndarray, one_hot: jnp.ndarray, *, ce_ratio: float = 0.1,
             dice_ratio: float = 0.9) -> jnp.ndarray:
    """loss = ce_ratio*CE + dice_ratio*Dice(softmax) (reference segmentation.py:44-47,
    ratios from conf/config_seg.yaml)."""
    import jax.nn

    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return ce_ratio * cross_entropy(logits, one_hot) + dice_ratio * dice_loss(probs, one_hot)


def confusion_matrix(pred: jnp.ndarray, label: jnp.ndarray, num_classes: int,
                     mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """[C, C] confusion matrix (rows = true, cols = pred) with an optional validity
    mask — the masked form replaces the reference's dynamic border cropping
    (segmentation.py:108-114) with static shapes for jit."""
    idx = (label.astype(jnp.int32) * num_classes + pred.astype(jnp.int32)).reshape(-1)
    weights = jnp.ones_like(idx, dtype=jnp.float32) if mask is None \
        else mask.reshape(-1).astype(jnp.float32)
    flat = jnp.zeros((num_classes * num_classes,), jnp.float32).at[idx].add(weights)
    return flat.reshape(num_classes, num_classes)


def border_mask(shape: tuple[int, int], overlap: int, cut_y: jnp.ndarray,
                cut_x: jnp.ndarray) -> jnp.ndarray:
    """Validity mask equal to ``[o:-(o+c_y), o:-(o+c_x)]`` cropping
    (reference segmentation.py:108-114): per-sample dynamic margins as a mask."""
    h, w = shape
    rows = jnp.arange(h)[None, :, None]
    cols = jnp.arange(w)[None, None, :]
    cy = cut_y.astype(jnp.int32)[:, None, None]
    cx = cut_x.astype(jnp.int32)[:, None, None]
    return ((rows >= overlap) & (rows < h - overlap - cy)
            & (cols >= overlap) & (cols < w - overlap - cx))


def calc_iou_scores(cm: np.ndarray) -> np.ndarray:
    """(reference modules/utils.py:33-40)"""
    tp = np.diag(cm)
    fp = cm.sum(axis=0) - tp
    fn = cm.sum(axis=1) - tp
    return tp / (tp + fp + fn + 1e-10)


def calc_dice_score(cm: np.ndarray) -> np.ndarray:
    """(reference modules/utils.py:21-30)"""
    dices = np.zeros((cm.shape[0],))
    tp = np.diagonal(cm)
    sum_pred = cm.sum(axis=0)
    sum_gt = cm.sum(axis=1)
    valid = sum_gt > 0
    dices[valid] = 2 * tp[valid] / (sum_gt[valid] + sum_pred[valid])
    return dices


def combined_tumor_cm(cm: np.ndarray) -> np.ndarray:
    """Collapse all tumor classes into one (reference segmentation.py:144-152):
    row 1 becomes the sum of rows 1.., then take the 2x2 corner."""
    comb = np.array(cm, copy=True)
    comb[1] = comb[1:].sum(axis=0)
    return comb[:2, :2]


def tumor_iou(cm: np.ndarray) -> float:
    return float(calc_iou_scores(combined_tumor_cm(cm))[1])


def subtype_variance(cm: np.ndarray) -> float:
    """Variance of the tumor-detection rate across subtype rows
    (reference segmentation.py:155-156)."""
    norm = cm / np.maximum(cm.sum(axis=1, keepdims=True), 1e-10)
    return float(np.var(norm[1:-1, 1])) if cm.shape[0] > 2 else 0.0


def plot_confusion_matrix(cm: np.ndarray, class_names_x, class_names_y,
                          title: str = "Confusion matrix"):
    """Matplotlib CM figure, possibly asymmetric (collapsed prediction classes vs
    full label classes — reference modules/utils.py:43-68). Returns the figure."""
    import itertools

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(6, 6))
    plt.imshow(cm, interpolation="nearest", cmap=plt.cm.Blues)
    plt.title(title)
    plt.xticks(np.arange(len(class_names_x)), class_names_x, rotation=45)
    plt.yticks(np.arange(len(class_names_y)), class_names_y)
    cm = np.around(cm, decimals=3)
    threshold = cm.max() / 2.0 if cm.size else 0.5
    for i, j in itertools.product(range(cm.shape[0]), range(cm.shape[1])):
        color = "white" if cm[i, j] > threshold else "black"
        plt.text(j, i, cm[i, j], horizontalalignment="center", color=color)
    plt.tight_layout()
    plt.ylabel("True label")
    plt.xlabel("Predicted label")
    return fig
