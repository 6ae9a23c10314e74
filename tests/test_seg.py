"""Segmentation stack tests: MiT-B2 U-Net shapes, loss/metric numerics, and a
train_seg end-to-end run on the flowers_anno + flowers_syn mix."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stedm_tpu.models.segformer import MiTEncoder, SegUNet
from stedm_tpu.utils import metrics as M

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def test_mit_encoder_feature_pyramid():
    enc = MiTEncoder(embed_dims=(16, 32, 64, 128), depths=(1, 1, 1, 1),
                     num_heads=(1, 2, 4, 8), sr_ratios=(8, 4, 2, 1))
    x = jnp.zeros((1, 64, 64, 3))
    variables = enc.init(jax.random.PRNGKey(0), x)
    feats = enc.apply(variables, x)
    assert [f.shape for f in feats] == [(1, 16, 16, 16), (1, 8, 8, 32),
                                        (1, 4, 4, 64), (1, 2, 2, 128)]


def test_seg_unet_full_resolution_logits():
    model = SegUNet(classes=2, decoder_channels=(32, 24, 16, 8, 8))
    # shrink the encoder through a monkeypatched config? use default B2 at tiny input
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, False)
    y = model.apply(variables, x, False, mutable=False)
    assert y.shape == (1, 64, 64, 2)


def test_dice_loss_matches_reference_formula():
    rng = np.random.default_rng(0)
    probs = rng.uniform(size=(2, 8, 8, 3)).astype(np.float32)
    one_hot = np.eye(3, dtype=np.float32)[rng.integers(0, 3, (2, 8, 8))]
    got = float(M.dice_loss(jnp.asarray(probs), jnp.asarray(one_hot)))
    # reference modules/utils.py:8-18 (torch dims (0,-1,-2) on NCHW == (B,H,W))
    inter = (probs * one_hot).sum(axis=(0, 1, 2))
    dice = (2 * inter + 0.01) / (one_hot.sum(axis=(0, 1, 2))
                                 + probs.sum(axis=(0, 1, 2)) + 0.01)
    np.testing.assert_allclose(got, float(np.mean(1 - dice[1:])), rtol=1e-5)


def test_cross_entropy_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(2, 4, 4, 3)).astype(np.float32)
    one_hot = np.eye(3, dtype=np.float32)[rng.integers(0, 3, (2, 4, 4))]
    got = float(M.cross_entropy(jnp.asarray(logits), jnp.asarray(one_hot)))
    t = torch.nn.CrossEntropyLoss()(
        torch.from_numpy(np.transpose(logits, (0, 3, 1, 2))),
        torch.from_numpy(np.transpose(one_hot, (0, 3, 1, 2))))
    np.testing.assert_allclose(got, float(t), rtol=1e-5)


def test_confusion_matrix_and_iou():
    pred = jnp.array([[0, 1], [1, 1]])
    label = jnp.array([[0, 2], [1, 0]])
    cm = np.asarray(M.confusion_matrix(pred, label, 3))
    expected = np.zeros((3, 3))
    expected[0, 0] += 1   # (l=0,p=0)
    expected[2, 1] += 1   # (l=2,p=1)
    expected[1, 1] += 1
    expected[0, 1] += 1
    np.testing.assert_array_equal(cm, expected)
    ious = M.calc_iou_scores(expected)
    np.testing.assert_allclose(ious[1], 1 / 3, rtol=1e-6)  # tp=1, fp=1, fn=1


def test_border_mask_matches_crop():
    cut_y = jnp.array([0, 2])
    cut_x = jnp.array([1, 0])
    mask = np.asarray(M.border_mask((8, 8), 1, cut_y, cut_x))
    ref0 = np.zeros((8, 8), bool)
    ref0[1:-1, 1:-2] = True   # o=1, c_y=0, c_x=1
    ref1 = np.zeros((8, 8), bool)
    ref1[1:-3, 1:-1] = True   # o=1, c_y=2, c_x=0
    np.testing.assert_array_equal(mask[0], ref0)
    np.testing.assert_array_equal(mask[1], ref1)


def test_combined_tumor_metrics():
    cm = np.array([[50, 5, 0], [4, 20, 1], [2, 3, 15]], dtype=float)
    comb = M.combined_tumor_cm(cm)
    np.testing.assert_array_equal(comb, [[50, 5], [6, 23]])
    assert 0 < M.tumor_iou(cm) < 1


def test_train_seg_entry_point(tmp_path):
    """train_seg on a synthetic 'syn' folder: loss finite, ckpts + metrics written."""
    import train_seg as ts
    from PIL import Image

    rng = np.random.default_rng(0)
    syn_dir = tmp_path / "syn_data" / "flowers"
    syn_dir.mkdir(parents=True)
    for i in range(4):
        img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        seg = (rng.uniform(size=(32, 32)) > 0.5).astype(np.uint8)
        Image.fromarray(img).save(syn_dir / f"img_{str(i).zfill(5)}.png")
        Image.fromarray(seg).save(syn_dir / f"seg_{str(i).zfill(5)}.png")

    result_dir = tmp_path / "results"
    ts.main([
        "data.patch_size=32", "data.samples=4", "data.batch_size=2",
        "num_epochs=1", "lr=1e-4", "location=pc", "accumulate_grad_batches=1",
        "data.overlap_train=1", "data.overlap_val=1",
        f"location.data_dir={tmp_path}", f"location.result_dir={result_dir}",
        "data/dataset=[flowers_syn]", "data.ratios=[1.0]",
        "compute_dtype=float32",
    ])
    events = (result_dir / "seg_flowers_syn" / "events.jsonl").read_text()
    assert "Train Loss" in events and "Train IoU Score" in events


def test_train_seg_with_pretrained_encoder(tmp_path, capsys):
    """`+encoder_ckpt=`: imagenet-MiT-B2-layout weights load into the encoder
    (reference modules/segmentation.py:41 encoder_weights='imagenet'); decoder
    stays at init. The checkpoint is a synthetic NVlabs-layout state_dict."""
    import torch

    import train_seg as ts
    from PIL import Image

    rng = np.random.default_rng(1)
    dims, depths, srs = (64, 128, 320, 512), (3, 4, 6, 3), (8, 4, 2, 1)
    sd = {}
    for s, (d, depth, sr) in enumerate(zip(dims, depths, srs)):
        t = s + 1
        in_ch, k = (3, 7) if s == 0 else (dims[s - 1], 3)
        sd[f"patch_embed{t}.proj.weight"] = rng.normal(0, 0.02, (d, in_ch, k, k))
        sd[f"patch_embed{t}.proj.bias"] = np.zeros(d)
        for nm in (f"patch_embed{t}.norm", f"norm{t}"):
            sd[f"{nm}.weight"] = np.ones(d)
            sd[f"{nm}.bias"] = np.zeros(d)
        for i in range(depth):
            b = f"block{t}.{i}."
            for nm in ("norm1", "norm2"):
                sd[b + nm + ".weight"] = np.ones(d)
                sd[b + nm + ".bias"] = np.zeros(d)
            sd[b + "attn.q.weight"] = rng.normal(0, 0.02, (d, d))
            sd[b + "attn.q.bias"] = np.zeros(d)
            sd[b + "attn.kv.weight"] = rng.normal(0, 0.02, (2 * d, d))
            sd[b + "attn.kv.bias"] = np.zeros(2 * d)
            sd[b + "attn.proj.weight"] = rng.normal(0, 0.02, (d, d))
            sd[b + "attn.proj.bias"] = np.zeros(d)
            if sr > 1:
                sd[b + "attn.sr.weight"] = rng.normal(0, 0.02, (d, d, sr, sr))
                sd[b + "attn.sr.bias"] = np.zeros(d)
                sd[b + "attn.norm.weight"] = np.ones(d)
                sd[b + "attn.norm.bias"] = np.zeros(d)
            sd[b + "mlp.fc1.weight"] = rng.normal(0, 0.02, (4 * d, d))
            sd[b + "mlp.fc1.bias"] = np.zeros(4 * d)
            sd[b + "mlp.dwconv.dwconv.weight"] = rng.normal(0, 0.02, (4 * d, 1, 3, 3))
            sd[b + "mlp.dwconv.dwconv.bias"] = np.zeros(4 * d)
            sd[b + "mlp.fc2.weight"] = rng.normal(0, 0.02, (d, 4 * d))
            sd[b + "mlp.fc2.bias"] = np.zeros(d)
    ckpt = tmp_path / "mit_b2_imagenet.pth"
    torch.save({"_model.encoder." + k: torch.from_numpy(np.asarray(v, np.float32))
                for k, v in sd.items()}, ckpt)

    syn_dir = tmp_path / "syn_data" / "flowers"
    syn_dir.mkdir(parents=True)
    for i in range(4):
        img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        seg = (rng.uniform(size=(32, 32)) > 0.5).astype(np.uint8)
        Image.fromarray(img).save(syn_dir / f"img_{str(i).zfill(5)}.png")
        Image.fromarray(seg).save(syn_dir / f"seg_{str(i).zfill(5)}.png")

    result_dir = tmp_path / "results"
    ts.main([
        "data.patch_size=32", "data.samples=4", "data.batch_size=2",
        "num_epochs=1", "lr=1e-4", "location=pc", "accumulate_grad_batches=1",
        "data.overlap_train=1", "data.overlap_val=1",
        f"location.data_dir={tmp_path}", f"location.result_dir={result_dir}",
        "data/dataset=[flowers_syn]", "data.ratios=[1.0]",
        "compute_dtype=float32",
        f"+encoder_ckpt={ckpt}",
    ])
    out = capsys.readouterr().out
    import re

    m = re.search(r"merged (\d+) tensors", out)
    assert m and int(m.group(1)) >= 250, out[-500:]
    events = (result_dir / "seg_flowers_syn" / "events.jsonl").read_text()
    assert "Train Loss" in events
