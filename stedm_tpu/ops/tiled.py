"""Device-side tiled application over large canvases with weighted stitching.

TPU-native counterpart of the reference's dormant fold/unfold machinery
(reference `ldm/models/diffusion/ddpm.py:574-654` `get_fold_unfold` weighting,
`:718-766`/`:828-861` tiled decode/encode, `:905-987` tiled apply_model —
`split_input_params` is never set by shipped configs, SURVEY.md §5.7). It lets the
VQ codec / U-Net run over canvases larger than a training patch: overlapping tiles
are processed by a scanned patch function and blended back with a smooth weight
window.

Static shapes throughout: the tile grid is computed at trace time, tiles are cut
with `lax.dynamic_slice`, results accumulate into the canvas with
`lax.dynamic_update_slice`-style scatter adds inside one `lax.scan`.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def _positions(size: int, patch: int, stride: int) -> np.ndarray:
    """Tile start offsets covering [0, size) with a final flush-right tile."""
    if size <= patch:
        return np.array([0])
    pos = list(range(0, size - patch + 1, stride))
    if pos[-1] != size - patch:
        pos.append(size - patch)
    return np.array(pos)


def _weight_window(patch: int, kind: str = "triangle") -> np.ndarray:
    """Smooth blending window over a tile (the reference's 'weighting' tensor,
    ddpm.py:604-633)."""
    if kind == "uniform":
        w1 = np.ones(patch)
    else:
        ramp = (np.arange(patch) + 0.5) / patch
        w1 = np.minimum(ramp, 1.0 - ramp) + 0.5 / patch
    w = np.outer(w1, w1)
    return (w / w.max()).astype(np.float32)


def tiled_apply(fn: Callable, x: jnp.ndarray, patch: int, stride: int, *,
                out_channels: int | None = None, scale: int = 1,
                window: str = "triangle") -> jnp.ndarray:
    """Apply ``fn`` ([B, patch, patch, C] -> [B, patch*scale, patch*scale, C'])
    over overlapping tiles of ``x`` and blend with the weight window.

    ``scale`` covers resolution-changing functions (VQ decode: scale=4 with latent
    tiles). Tiles run sequentially under `lax.scan` — memory-bounded regardless of
    canvas size; batch parallelism still fills the chip.
    """
    b, h, w, c = x.shape
    ys = _positions(h, patch, stride)
    xs = _positions(w, patch, stride)
    grid = np.array([(y, xx) for y in ys for xx in xs], dtype=np.int32)
    n_tiles = len(grid)

    out_c = out_channels or c
    out_h, out_w = h * scale, w * scale
    weight = jnp.asarray(_weight_window(patch * scale, window))[None, :, :, None]

    def body(carry, pos):
        acc, norm = carry
        y0, x0 = pos[0], pos[1]
        tile = jax.lax.dynamic_slice(x, (0, y0, x0, 0), (b, patch, patch, c))
        out_tile = fn(tile).astype(jnp.float32) * weight
        acc = jax.lax.dynamic_update_slice(
            acc, jax.lax.dynamic_slice(
                acc, (0, y0 * scale, x0 * scale, 0),
                (b, patch * scale, patch * scale, out_c)) + out_tile,
            (0, y0 * scale, x0 * scale, 0))
        norm = jax.lax.dynamic_update_slice(
            norm, jax.lax.dynamic_slice(
                norm, (0, y0 * scale, x0 * scale, 0),
                (1, patch * scale, patch * scale, 1)) + weight,
            (0, y0 * scale, x0 * scale, 0))
        return (acc, norm), ()

    acc0 = jnp.zeros((b, out_h, out_w, out_c), jnp.float32)
    norm0 = jnp.zeros((1, out_h, out_w, 1), jnp.float32)
    (acc, norm), _ = jax.lax.scan(body, (acc0, norm0), jnp.asarray(grid))
    return acc / jnp.maximum(norm, 1e-8)
