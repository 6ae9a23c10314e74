#!/usr/bin/env python
"""Input-pipeline throughput: python numpy path vs native kernel vs async pool.

Measures wsi_sample-equivalent patch extraction (crop + white fill + block-mean
downscale) from an in-memory pyramid — the WSI decode hot loop
(SURVEY.md §2.9; reference relies on forked torch DataLoader workers).

    python tools/bench_input.py [--size 8192] [--patch 512] [--scale 4] [--n 256]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=8192)
    ap.add_argument("--patch", type=int, default=512)
    ap.add_argument("--scale", type=int, default=4)
    ap.add_argument("--n", type=int, default=256)
    args = ap.parse_args()

    from stedm_tpu import native
    from stedm_tpu.data.native_pipeline import AsyncPatchPipeline
    from stedm_tpu.data.wsi import ArraySlide, wsi_sample

    rng = np.random.default_rng(0)
    slide = ArraySlide(rng.integers(0, 255, (args.size, args.size, 3),
                                    dtype=np.uint8))
    positions = [(int(y), int(x))
                 for y, x in rng.integers(0, args.size, (args.n, 2))]

    def timed(label, fn):
        fn()  # warm
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        print(f"{label:28s} {args.n / dt:9.1f} patches/s")
        return args.n / dt

    # python numpy path (native fast path disabled)
    orig = native.wsi_patch_native
    native.wsi_patch_native = lambda *a, **k: None
    try:
        timed("python (numpy loop)", lambda: [
            wsi_sample(slide, (0, 0), args.patch, args.scale, p)
            for p in positions])
    finally:
        native.wsi_patch_native = orig

    if not native.available():
        print("native lib unavailable; build with `make -C native`")
        return

    timed("native kernel (sync loop)", lambda: [
        wsi_sample(slide, (0, 0), args.patch, args.scale, p) for p in positions])

    pipe = AsyncPatchPipeline()
    lvl, down = 0, args.scale  # worst case: full residual downscale
    from stedm_tpu.data.wsi import _level_plan

    lvl, down = _level_plan(slide, args.patch, args.scale)
    ds = int(slide.level_downsamples[lvl])
    coords = np.array([[  # mirror wsi_sample coordinate math
        int(p[0] - (args.patch / 2) * args.scale) // ds,
        int(p[1] - (args.patch / 2) * args.scale) // ds] for p in positions],
        np.int64)
    timed("native async pool (batch)", lambda: pipe.submit(
        slide._levels[lvl], coords, args.patch, down).get())


if __name__ == "__main__":
    main()
