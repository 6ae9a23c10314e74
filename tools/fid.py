#!/usr/bin/env python
"""FID evaluation for generated image sets (the BASELINE.json parity metric).

Computes the Fréchet distance between feature distributions of two image folders
(e.g. real patches vs `predict_diff.py` outputs):

    FID = |mu_1 - mu_2|^2 + tr(S_1 + S_2 - 2 (S_1 S_2)^{1/2})

Standard FID uses InceptionV3 pool3 features; those weights need network egress, so
the featurizer is pluggable: pass ``--features`` pointing at a checkpoint imported
via `stedm_tpu.utils.torch_import` for a standard-comparable number, or omit it to
use a seeded random-projection featurizer — *self-consistent* across runs of this
tool (fixed seed), useful for relative comparisons between checkpoints, not
comparable to published FIDs.

Weights contract (for a weights-staged environment — VERDICT r2 task 8):
the standard-comparable number expects pytorch-fid's re-trained FID InceptionV3,

    pt_inception-2015-12-05-6726825d.pth
    https://github.com/mseitzer/pytorch-fid/releases/download/fid_weights/pt_inception-2015-12-05-6726825d.pth

(the ``6726825d`` filename suffix is the first 8 hex chars of the file's sha256,
torch.hub's integrity convention — `torch.hub.load_state_dict_from_url` verifies
it on download, or check manually: ``sha256sum <file> | cut -c1-8`` must equal
``6726825d``). torchvision's ``inception_v3_google-0cc3c7bd.pth`` also imports
(same layout; BN-folded by `map_inception`) but yields *torchvision*-FID numbers,
which differ slightly from pytorch-fid's. Invocation:

    python tools/fid.py /path/real_dir /path/fake_dir \
        --features /weights/pt_inception-2015-12-05-6726825d.pth

Import-path validation: `tests/test_inception_fid.py` (forward parity vs a
hand-built torch twin of the pool3 graph).

Usage:
    python tools/fid.py /path/real_dir /path/fake_dir [--batch 32] [--limit N]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def frechet_distance(mu1: np.ndarray, sigma1: np.ndarray, mu2: np.ndarray,
                     sigma2: np.ndarray, eps: float = 1e-6) -> float:
    """Exact Fréchet distance between two Gaussians (Heusel et al. 2017)."""
    from scipy import linalg

    diff = mu1 - mu2
    covmean = linalg.sqrtm(sigma1 @ sigma2)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def fid_from_features(f1: np.ndarray, f2: np.ndarray) -> float:
    mu1, s1 = f1.mean(axis=0), np.cov(f1, rowvar=False)
    mu2, s2 = f2.mean(axis=0), np.cov(f2, rowvar=False)
    return frechet_distance(mu1, s1, mu2, s2)


def random_projection_featurizer(dim: int = 512, patch: int = 64, seed: int = 0):
    """Seeded random conv features: cheap, deterministic, self-consistent.
    NOT comparable to published Inception-based FIDs."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i, ch in enumerate((32, 64, 128)):
                x = nn.Conv(ch, (3, 3), strides=(2, 2), name=f"c{i}")(x)
                x = nn.relu(x)
            x = x.mean(axis=(1, 2))
            return nn.Dense(dim, name="proj")(x)

    net = Net()
    params = net.init(jax.random.PRNGKey(seed), jnp.zeros((1, patch, patch, 3)))
    fn = jax.jit(lambda imgs: net.apply(params, imgs))

    def featurize(images: np.ndarray) -> np.ndarray:
        import cv2

        resized = np.stack([cv2.resize(im, (patch, patch)) for im in images])
        x = jnp.asarray(resized.astype(np.float32) / 127.5 - 1.0)
        return np.asarray(fn(x))

    return featurize


def inception_featurizer(ckpt_path: str):
    """Standard FID featurizer: InceptionV3 pool3 (2048-d), weights imported from
    a staged torch checkpoint (torchvision inception_v3 / pytorch-fid
    pt_inception layout; BN folded at import). Input handling mirrors
    pytorch-fid: bilinear resize to 299, scale to [-1, 1]."""
    import jax
    import jax.numpy as jnp

    from stedm_tpu.models.inception import InceptionV3FID
    from stedm_tpu.utils.torch_import import load_torch_state_dict, map_inception

    net = InceptionV3FID()
    params = map_inception(load_torch_state_dict(ckpt_path))
    fn = jax.jit(lambda imgs: net.apply({"params": params}, imgs))

    def featurize(images: np.ndarray) -> np.ndarray:
        import cv2

        resized = np.stack([
            cv2.resize(im, (299, 299), interpolation=cv2.INTER_LINEAR)
            for im in images])
        x = jnp.asarray(resized.astype(np.float32) / 127.5 - 1.0)
        return np.asarray(fn(x))

    return featurize


def folder_features(folder: str, featurize, *, batch: int = 32,
                    limit: int | None = None, prefix: str = "img_") -> np.ndarray:
    from PIL import Image

    paths = sorted(Path(folder).glob(f"{prefix}*.png")) or \
        sorted(p for p in Path(folder).iterdir()
               if p.suffix.lower() in (".png", ".jpg", ".jpeg"))
    if limit:
        paths = paths[:limit]
    feats = []
    for i in range(0, len(paths), batch):
        imgs = np.stack([np.array(Image.open(p).convert("RGB"))
                         for p in paths[i:i + batch]])
        feats.append(featurize(imgs))
    return np.concatenate(feats, axis=0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("real_dir")
    ap.add_argument("fake_dir")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--features", default=None, metavar="CKPT",
                    help="torch InceptionV3 checkpoint for standard-comparable "
                         "FID (pool3 features); omit for the seeded "
                         "random-projection featurizer")
    args = ap.parse_args()

    if args.features:
        featurize = inception_featurizer(args.features)
        label = "InceptionV3 pool3"
    else:
        featurize = random_projection_featurizer()
        label = "random-projection featurizer"
    f_real = folder_features(args.real_dir, featurize, batch=args.batch,
                             limit=args.limit)
    f_fake = folder_features(args.fake_dir, featurize, batch=args.batch,
                             limit=args.limit)
    fid = fid_from_features(f_real, f_fake)
    print(f"FID ({label}): {fid:.4f} "
          f"({len(f_real)} real / {len(f_fake)} fake)")


if __name__ == "__main__":
    main()
