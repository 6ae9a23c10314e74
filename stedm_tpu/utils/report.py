"""Model build reports: parameter counts and (optionally) FLOPs.

The reference prints parameter counts at init (`ldm/util.py:71-75` ``count_params``,
called at ddpm.py:90) and carries a vestigial attention FLOP counter (SURVEY.md
§5.1). Here: a per-group param report at model build, an XLA-derived FLOP count for
any jitted function, and a `jax.profiler` trace context for xprof.
"""

from __future__ import annotations

import contextlib

import jax
import numpy as np


def count_params(params, verbose: bool = True, name: str = "model") -> int:
    total = 0
    lines = []
    tree = params.items() if isinstance(params, dict) else [("", params)]
    for group, sub in tree:
        n = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(sub))
        total += n
        lines.append(f"  {group}: {n / 1e6:.2f}M")
    if verbose:
        print(f"{name}: {total / 1e6:.2f}M params")
        for line in lines:
            print(line)
    return total


def flops_of(fn, *args) -> float:
    """XLA-estimated FLOPs of one jitted call (scan bodies counted once)."""
    cost = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return float(cost.get("flops", 0.0))


@contextlib.contextmanager
def profile_trace(log_dir: str | None):
    """jax.profiler trace context; no-op when log_dir is None
    (view with xprof/tensorboard)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def log_txt_as_img(wh: tuple[int, int], captions: list[str],
                   size: int = 10) -> np.ndarray:
    """Render captions onto white canvases for image logging (reference
    `ldm/util.py:17-38`). Host-side PIL; returns NHWC float32 in [-1, 1]
    (the reference returns NCHW torch in the same range). Wraps every
    ``int(40 * w/256)`` characters like the reference; uses the system
    DejaVuSans (the reference hardcodes a repo-local copy) with a PIL
    default-font fallback."""
    from PIL import Image, ImageDraw, ImageFont

    try:
        font = ImageFont.truetype(
            "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf", size=size)
    except OSError:
        font = ImageFont.load_default()
    out = []
    nc = int(40 * (wh[0] / 256))
    for caption in captions:
        canvas = Image.new("RGB", wh, color="white")
        draw = ImageDraw.Draw(canvas)
        lines = "\n".join(caption[start:start + nc]
                          for start in range(0, len(caption), nc))
        try:
            draw.text((0, 0), lines, fill="black", font=font)
        except UnicodeEncodeError:
            print("Can't encode string for logging. Skipping.")
        out.append(np.asarray(canvas, dtype=np.float32) / 127.5 - 1.0)
    return np.stack(out)
