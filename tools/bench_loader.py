#!/usr/bin/env python
"""End-to-end input-pipeline throughput through the REAL Loader.

VERDICT r3 task 3: `tools/bench_input.py` measures raw WSI patch extraction,
but nothing recorded whether the full host pipeline (dataset __getitem__:
decode + augment + style sampling -> collate -> threaded prefetch) can
sustain the ~20 samples/s the 512² training step consumes. This tool builds
the two representative data paths on disk and drives `DataModule.train_loader`
exactly as train_diff.py does (reference counterpart: forked DataLoader
workers, `/root/reference/data/dm.py:49-57`):

* flowers augment path (`style_sampling=augmented`): jpeg decode + resize +
  random crop/flip/color augment + style-set fan-out;
* HER2 ArraySlide WSI path (`style_sampling=nearby`): pyramid crop + white
  fill + block-mean downscale + nearby style patch.

Prints samples/s per (path, num_workers) plus one JSON line, and optionally
(--h2d) times jax.device_put of the collated batches on the default backend
— through the axon tunnel that is the ~30 MB/s wall CLAUDE.md documents, so
H2D timing defaults off and the flag exists to price it deliberately.

    python tools/bench_loader.py [--patch 512] [--batches 8] [--workers 0 4 8]
"""

from __future__ import annotations

import argparse
import json
import pickle
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

CONF = Path(__file__).resolve().parents[1] / "configs"


def make_flowers_tree(root: Path, n: int = 48, size: int = 512) -> Path:
    """Miniature Flowers-102 tree with production-sized jpegs."""
    import scipy.io
    from PIL import Image

    base = root / "flowers"
    (base / "imgs").mkdir(parents=True)
    (base / "segs").mkdir(parents=True)
    rng = np.random.default_rng(0)
    labels = np.array([(i % 6) + 1 for i in range(n)])
    ids = list(range(1, n + 1))
    for i in range(n):
        img = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
        seg = np.zeros((size, size, 3), dtype=np.uint8)
        seg[:, :, 2] = 255
        s = size // 4
        seg[s:3 * s, s:3 * s] = [200, 200, 0]
        Image.fromarray(img).save(base / "imgs" / f"image_{i + 1:05d}.jpg")
        Image.fromarray(seg).save(base / "segs" / f"segmim_{i + 1:05d}.jpg")
    scipy.io.savemat(base / "imagelabels.mat", {"labels": labels[None]})
    scipy.io.savemat(base / "setid.mat",
                     {"trnid": np.array(ids)[None],
                      "valid": np.array(ids[:2])[None],
                      "tstid": np.array(ids[:2])[None]})
    return root


def make_her2_tree(root: Path, slide: int = 2048) -> Path:
    """Pickled ROI lists + ArraySlide WSIs (the OpenSlide-free backend)."""
    import cv2

    from stedm_tpu.data.wsi import block_reduce_median

    base = root / "her2_anno_her2_anno"
    wsi_dir = base / "wsi"
    wsi_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)

    def roi(wsi_num):
        img = rng.integers(30, 220, (slide, slide, 3), dtype=np.uint8)
        name = f"slide_{wsi_num}.png"
        cv2.imwrite(str(wsi_dir / name), img)
        seg = np.zeros((slide, slide), np.uint8)
        seg[slide // 4:3 * slide // 4, slide // 4:3 * slide // 4] = 2
        samp = block_reduce_median(seg, 8)
        return (name, (0, 0), cv2.imencode(".png", seg)[1],
                cv2.imencode(".png", samp)[1], wsi_num)

    with open(base / "train_val.pkl", "wb") as f:
        pickle.dump([roi(101), roi(102)], f)
    with open(base / "test.pkl", "wb") as f:
        pickle.dump([roi(103)], f)
    return root


def build_dm(kind: str, data_dir: Path, patch: int, batch: int,
             n_workers: int):
    from stedm_tpu.config import compose
    from stedm_tpu.data.dm import DataModule

    if kind == "flowers":
        overrides = [
            "data.patch_size=%d" % patch, "data.batch_size=%d" % batch,
            "data.samples=256", "data.class_train_samples=8",
            "location=pc", f"location.data_dir={data_dir}",
            f"location.n_workers={n_workers}",
            "style_sampling=augmented", "style_agg=mean",
            "data/dataset=[flowers_anno,flowers_unanno]",
            "data.ratios=[1.0,1.0]",
            "data.dataset.flowers_anno.train_classes=[0,1,2]",
            "data.dataset.flowers_anno.unanno_classes="
            + str(list(range(3, 102))).replace(" ", ""),
            "data.dataset.flowers_unanno.train_classes=[0,1,2]",
            "data.dataset.flowers_unanno.unanno_classes="
            + str(list(range(3, 102))).replace(" ", ""),
        ]
    else:
        overrides = [
            "data=her2", "data.patch_size=%d" % patch,
            "data.batch_size=%d" % batch, "data.samples=256",
            "data.base_scale=2", "data.lookup_f=8",
            "data.overlap_val=%d" % min(4, patch // 8),
            "data.class_train_samples=8",
            "location=pc", f"location.data_dir={data_dir}",
            f"location.n_workers={n_workers}",
            "style_sampling=nearby",
            "data.dataset.her2_anno.score_dict={101: 0, 102: 0, 103: 1}",
            "data.dataset.her2_anno.folds=[[102]]",
        ]
    cfg = compose("config_diff", overrides, config_dir=CONF)
    dm = DataModule(cfg)
    dm.setup()
    return dm


def time_loader(dm, batches: int, seed: int = 0, h2d: bool = False):
    loader = dm.train_loader(seed=seed)
    it = iter(loader)
    first = next(it)  # warm: thread pool spin-up + first decode burst
    bsz = len(first[0])
    n = 0
    t0 = time.perf_counter()
    got = []
    for _ in range(batches):
        try:
            b = next(it)
        except StopIteration:
            it = iter(loader)
            b = next(it)
        n += len(b[0])
        if h2d:
            got.append(b)
    dt = time.perf_counter() - t0
    rate = n / dt
    h2d_rate = None
    if h2d:
        import jax

        t0 = time.perf_counter()
        # keep EVERY batch's device arrays alive and block on all of them —
        # blocking only on the last batch lets earlier transfers still be in
        # flight when the clock stops (optimistic rate), and dropping their
        # arrays can even let the runtime cancel them (ADVICE r4)
        arrs = [jax.device_put(np.asarray(a)) for b in got for a in b[:4]]
        jax.block_until_ready(arrs)
        h2d_rate = n / (time.perf_counter() - t0)
    return rate, bsz, h2d_rate


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--patch", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--workers", type=int, nargs="+", default=[0, 2, 4, 8])
    ap.add_argument("--paths", nargs="+", default=["flowers", "her2"])
    ap.add_argument("--h2d", action="store_true",
                    help="also time device_put of the batches (through the "
                         "axon tunnel this measures the ~30 MB/s wall)")
    ap.add_argument("--flowers_src", type=int, default=512,
                    help="source jpeg edge (decode+resize cost scales with it)")
    args = ap.parse_args()

    results = {}
    with tempfile.TemporaryDirectory() as td:
        tmp = Path(td)
        trees = {}
        if "flowers" in args.paths:
            trees["flowers"] = make_flowers_tree(tmp / "f",
                                                 size=args.flowers_src)
        if "her2" in args.paths:
            # slide must comfortably contain patch*base_scale with sampling
            # margins or the per-class position pools come up empty
            trees["her2"] = make_her2_tree(tmp / "h",
                                           slide=max(4096, 8 * args.patch))
        for kind, tree in trees.items():
            for w in args.workers:
                key = f"{kind}_w{w}"
                try:
                    dm = build_dm(kind, tree, args.patch, args.batch, w)
                    rate, bsz, h2d_rate = time_loader(dm, args.batches,
                                                      h2d=args.h2d)
                except Exception as e:  # record, keep the other configs
                    results[key] = f"error: {e!r}"
                    print(f"{kind} workers={w}: FAILED {e!r}",
                          file=sys.stderr, flush=True)
                    continue
                results[key] = round(rate, 2)
                line = (f"{kind:8s} workers={w}: {rate:7.2f} samples/s "
                        f"(batch {bsz}, {args.patch}²)")
                if h2d_rate is not None:
                    results[key + "_h2d"] = round(h2d_rate, 2)
                    line += f"; H2D {h2d_rate:.2f} samples/s"
                print(line, file=sys.stderr, flush=True)
    print(json.dumps({"metric": f"{args.patch}x{args.patch} loader throughput",
                      "unit": "samples/sec", "host_cores": _nproc(),
                      **results}))


def _nproc() -> int:
    import os

    return os.cpu_count() or 1


if __name__ == "__main__":
    main()
