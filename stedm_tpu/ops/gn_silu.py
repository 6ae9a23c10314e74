"""Fused GroupNorm(+embedding-add | +FiLM)(+SiLU) for the ResBlock hot path.

The U-Net's per-ResBlock chain (reference openaimodel.py:176-288) is
``GN -> SiLU -> conv`` twice, with the timestep/style embedding either added
before the second GN or applied as FiLM scale/shift after it. XLA lowers each
GroupNorm to two passes over the activation (one reduce for the statistics, one
fused normalize+activation), i.e. 2 reads + 1 write of HBM per norm. When a
whole sample fits VMEM, this kernel does it in ONE pass — read bf16 once,
compute fp32 statistics on-chip, normalize+affine+FiLM+SiLU, write once —
cutting the norm's HBM traffic by a third. The optional fused ``add`` also
absorbs the ``h + emb`` broadcast that otherwise costs its own pass.

Semantics match ``flax.linen.GroupNorm`` (one-pass variance E[x^2] - E[x]^2 in
float32) followed by the affine, optional FiLM ``y * (1 + scale) + shift``
(reference openaimodel.py:271-277), and SiLU. Gradients: ``jax.custom_vjp``
with a jnp backward (recomputes statistics; same cost profile as the
rematerialized reference blocks).

Dispatch: the Pallas kernel runs on TPU when the per-sample slab fits VMEM and
the channel count is lane-aligned; everywhere else (CPU tests, oversized VQ
decoder slabs where two HBM passes are optimal anyway) the jnp reference path
runs and XLA fuses it as before.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# largest per-sample element count the single-pass kernel will take. The
# scoped-VMEM budget is ~16MB and Mosaic double-buffers the in/out blocks
# across grid steps, so the footprint is ~4x the bf16 slab plus the chunked
# fp32 working set: 2^20 elems = 4 x 2MB + ~1MB. (2^21 measured to OOM by 2KB.)
MAX_ELEMS_PER_SAMPLE = 1 << 20

# fp32 working-set target per chunk (elements); chunk rows are multiples of 16
# to respect the bf16 sublane tile
_CHUNK_ELEMS = 128 * 1024


def _row_chunks(hw: int, c: int) -> list[tuple[int, int]]:
    """Static (start, size) row chunks keeping the fp32 working set ~small;
    chunk starts/sizes are multiples of 16 (bf16 sublane tile) except a ragged
    tail."""
    rows = max(16, (_CHUNK_ELEMS // max(c, 1)) // 16 * 16)
    return [(s, min(rows, hw - s)) for s in range(0, hw, rows)]


def _make_kernel(groups: int, n_per_group: int, eps: float, has_add: bool,
                 has_film: bool, apply_silu: bool, hw: int, c: int):
    chunks = _row_chunks(hw, c)

    def kernel(*refs):
        it = iter(refs)
        x_ref = next(it)
        gamma_ref = next(it)
        beta_ref = next(it)
        mask_ref = next(it)                      # [C, G] one-hot, fp32
        add_ref = next(it) if has_add else None
        fs_ref = next(it) if has_film else None
        fsh_ref = next(it) if has_film else None
        out_ref = next(it)

        # per-sample vectors ride in as full [B, C] blocks (a (1, C) block over
        # a (B, C) array violates the TPU sublane rule, and a dynamic sublane
        # index is not provably 8-aligned) — select this program's row by mask
        i = pl.program_id(0)

        def row(ref):                            # [B, C] -> [1, C] (row i)
            full = ref[:].astype(jnp.float32)
            ids = jax.lax.broadcasted_iota(jnp.int32, full.shape, 0)
            return jnp.sum(jnp.where(ids == i, full, 0.0), axis=0, keepdims=True)

        add = row(add_ref) if has_add else None

        # pass 1: per-channel sums, streamed over row chunks so the fp32
        # working set stays ~_CHUNK_ELEMS (the bf16 block itself is resident)
        s = jnp.zeros((1, c), jnp.float32)
        sq = jnp.zeros((1, c), jnp.float32)
        for start, size in chunks:
            xc = x_ref[0, start:start + size, :].astype(jnp.float32)
            if has_add:
                xc = xc + add
            s = s + jnp.sum(xc, axis=0, keepdims=True)
            sq = sq + jnp.sum(xc * xc, axis=0, keepdims=True)

        mask = mask_ref[:]
        inv_n = 1.0 / n_per_group
        mean_g = jnp.dot(s, mask, preferred_element_type=jnp.float32) * inv_n
        msq_g = jnp.dot(sq, mask, preferred_element_type=jnp.float32) * inv_n
        var_g = msq_g - mean_g * mean_g                  # [1, G]
        rstd_g = jax.lax.rsqrt(var_g + eps)
        # broadcast per-group stats back to per-channel lanes via the mask
        contract = (((1,), (1,)), ((), ()))              # [1,G] x [C,G] -> [1,C]
        mean_c = jax.lax.dot_general(mean_g, mask, contract,
                                     preferred_element_type=jnp.float32)
        rstd_c = jax.lax.dot_general(rstd_g, mask, contract,
                                     preferred_element_type=jnp.float32)
        g_c = rstd_c * gamma_ref[:]
        fs = (1.0 + row(fs_ref)) if has_film else None
        fsh = row(fsh_ref) if has_film else None

        # pass 2: normalize+activate per chunk (VMEM-resident block, no HBM
        # re-read), write through
        for start, size in chunks:
            xc = x_ref[0, start:start + size, :].astype(jnp.float32)
            if has_add:
                xc = xc + add
            y = (xc - mean_c) * g_c + beta_ref[:]
            if has_film:
                y = y * fs + fsh
            if apply_silu:
                y = y * jax.nn.sigmoid(y)
            out_ref[0, start:start + size, :] = y.astype(out_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("groups", "eps", "apply_silu",
                                              "interpret"))
def _gn_silu_pallas(x, gamma, beta, add, film_scale, film_shift, *,
                    groups: int, eps: float, apply_silu: bool,
                    interpret: bool = False):
    b, h, w, c = x.shape
    hw = h * w
    cg = c // groups
    xr = x.reshape(b, hw, c)

    mask = (jnp.arange(c)[:, None] // cg
            == jnp.arange(groups)[None, :]).astype(jnp.float32)

    operands = [xr, gamma.astype(jnp.float32).reshape(1, c),
                beta.astype(jnp.float32).reshape(1, c), mask]
    in_specs = [
        pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((c, groups), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    per_sample = pl.BlockSpec((b, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    if add is not None:
        operands.append(add.reshape(b, c))
        in_specs.append(per_sample)
    if film_scale is not None:
        operands.extend([film_scale.reshape(b, c), film_shift.reshape(b, c)])
        in_specs.extend([per_sample, per_sample])

    kernel = _make_kernel(groups, hw * cg, eps, add is not None,
                          film_scale is not None, apply_silu, hw, c)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hw, c), x.dtype),
        interpret=interpret,
    )(*operands)
    return out.reshape(b, h, w, c)


def _forward_parts(x, gamma, beta, add, film_scale, film_shift,
                   groups: int, eps: float):
    """Shared forward pipeline (flax GroupNorm numerics, fp32): returns the
    intermediates both `gn_silu_reference` and the custom-VJP backward need,
    so the two can never drift."""
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32)
    if add is not None:
        xf = xf + add.astype(jnp.float32)[:, None, None, :]
    xg = xf.reshape(b, h * w, groups, c // groups)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
    var = jnp.mean(xg * xg, axis=(1, 3), keepdims=True) - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    xhat = ((xg - mean) * rstd).reshape(b, h, w, c)
    z = xhat * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    if film_scale is not None:
        wv = z * (1.0 + film_scale.astype(jnp.float32)[:, None, None, :]) \
            + film_shift.astype(jnp.float32)[:, None, None, :]
    else:
        wv = z
    return xhat, rstd, z, wv


def gn_silu_reference(x, gamma, beta, add=None, film_scale=None,
                      film_shift=None, *, groups: int = 32, eps: float = 1e-5,
                      apply_silu: bool = True):
    """jnp formulation (flax GroupNorm numerics); ground truth + fallback."""
    _, _, _, wv = _forward_parts(x, gamma, beta, add, film_scale, film_shift,
                                 groups, eps)
    y = jax.nn.silu(wv) if apply_silu else wv
    return y.astype(x.dtype)


def _use_kernel(x, groups: int) -> bool:
    import os

    # MEASURED NEGATIVE RESULT (v5e, 2026-08-17, bench.py A/B): the one-pass
    # kernel LOSES to XLA's two-pass lowering end-to-end — exact sampling
    # 7.62 vs 7.94 img/s, serving mode 16.8 vs 18.0 img/s — because XLA fuses
    # the norm's second pass into the consumer conv's input pipeline, which a
    # custom call blocks. Default off; STEDM_FUSED_GN=1 re-enables for
    # benchmarking. (Same lesson as the int8-conv probe: don't interpose
    # custom kernels where XLA's fusion already rides the conv.)
    if os.environ.get("STEDM_FUSED_GN", "") in ("", "0", "false", "False"):
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    b, h, w, c = x.shape
    # the VMEM cap is calibrated in bf16 elements; scale down for wider dtypes
    max_elems = MAX_ELEMS_PER_SAMPLE // max(1, x.dtype.itemsize // 2)
    # sublane tile: (16, 128) for 2-byte dtypes, (8, 128) for fp32. Requiring
    # h*w to be a tile multiple keeps every _row_chunks boundary aligned
    # (chunk rows are multiples of 16), incl. the ragged tail — interpret-mode
    # tests can't catch Mosaic lowering violations, so gate here (ADVICE r2).
    sublane = 16 if x.dtype.itemsize == 2 else 8
    return (c % groups == 0 and c % 128 == 0 and (h * w) % sublane == 0
            and h * w * c <= max_elems)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _gn_silu(x, gamma, beta, add, film_scale, film_shift,
             groups: int, eps: float, apply_silu: bool):
    return _gn_silu_pallas(x, gamma, beta, add, film_scale, film_shift,
                           groups=groups, eps=eps, apply_silu=apply_silu)


def _gn_silu_fwd(x, gamma, beta, add, film_scale, film_shift,
                 groups, eps, apply_silu):
    out = _gn_silu(x, gamma, beta, add, film_scale, film_shift,
                   groups, eps, apply_silu)
    return out, (x, gamma, beta, add, film_scale, film_shift)


def _gn_silu_bwd(groups, eps, apply_silu, res, g):
    x, gamma, beta, add, film_scale, film_shift = res
    b, h, w, c = x.shape
    cg = c // groups

    # recompute through the SAME pipeline as the reference forward
    xhat, rstd, z, wv = _forward_parts(x, gamma, beta, add, film_scale,
                                       film_shift, groups, eps)
    gammaf = gamma.astype(jnp.float32)
    if film_scale is not None:
        fs = film_scale.astype(jnp.float32)[:, None, None, :]

    gf = g.astype(jnp.float32)
    if apply_silu:
        sig = jax.nn.sigmoid(wv)
        dw = gf * sig * (1.0 + wv * (1.0 - sig))
    else:
        dw = gf

    if film_scale is not None:
        d_fs = jnp.sum(dw * z, axis=(1, 2)).astype(film_scale.dtype)
        d_fsh = jnp.sum(dw, axis=(1, 2)).astype(film_shift.dtype)
        dz = dw * (1.0 + fs)
    else:
        d_fs = d_fsh = None
        dz = dw

    d_gamma = jnp.sum(dz * xhat, axis=(0, 1, 2)).astype(gamma.dtype)
    d_beta = jnp.sum(dz, axis=(0, 1, 2)).astype(beta.dtype)

    dxhat = (dz * gammaf).reshape(b, h * w, groups, cg)
    xhat_g = xhat.reshape(b, h * w, groups, cg)
    m1 = jnp.mean(dxhat, axis=(1, 3), keepdims=True)
    m2 = jnp.mean(dxhat * xhat_g, axis=(1, 3), keepdims=True)
    dxg = rstd * (dxhat - m1 - xhat_g * m2)
    dx = dxg.reshape(b, h, w, c)

    d_add = (jnp.sum(dx, axis=(1, 2)).astype(add.dtype)
             if add is not None else None)
    return dx.astype(x.dtype), d_gamma, d_beta, d_add, d_fs, d_fsh


_gn_silu.defvjp(_gn_silu_fwd, _gn_silu_bwd)


def gn_silu(x, gamma, beta, add=None, film_scale=None, film_shift=None, *,
            groups: int = 32, eps: float = 1e-5, apply_silu: bool = True):
    """Fused GroupNorm(+add|+FiLM)(+SiLU); see module docstring.

    x: [B,H,W,C]; gamma/beta: [C]; add / film_scale / film_shift: [B,C]
    (``add`` is applied before the statistics, FiLM after the affine).
    Returns x.dtype; statistics in float32.

    Dispatch happens OUTSIDE the custom_vjp: when the Pallas kernel is not in
    play, the jnp formulation runs under plain autodiff so XLA derives (and
    fuses) the backward itself — the hand-written VJP exists only to make the
    kernel's forward differentiable.
    """
    assert (film_scale is None) == (film_shift is None)
    assert add is None or film_scale is None, "add and FiLM are exclusive"
    if _use_kernel(x, groups):
        return _gn_silu(x, gamma, beta, add, film_scale, film_shift,
                        groups, eps, apply_silu)
    return gn_silu_reference(x, gamma, beta, add, film_scale, film_shift,
                             groups=groups, eps=eps, apply_silu=apply_silu)
