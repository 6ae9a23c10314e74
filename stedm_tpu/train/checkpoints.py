"""Checkpoint save/restore via orbax.

Reproduces the reference's three mechanisms (SURVEY.md §5.4):
1. periodic full-state checkpoints — diffusion keeps the last epoch
   (monitor "epoch"/max, reference train_diff.py:64-66), segmentation keeps the
   best Val Loss (train_seg.py:74-76); both surfaces live here as ``save``/`
   `best_tag`` conventions,
2. partial warm-start with key filtering (reference ddpm.py:189-205
   ``init_from_ckpt(ignore_keys, only_model)``) — see :func:`partial_restore`,
3. predict-time non-strict load (reference predict_diff.py:48) — restore tolerates
   missing/extra subtrees via ``partial_restore``.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import orbax.checkpoint as ocp


def save(ckpt_dir: str | Path, state: Any, name: str = "last") -> str:
    path = (Path(ckpt_dir) / name).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)
    return str(path)


def restore(ckpt_dir: str | Path, target: Any, name: str = "last") -> Any:
    path = (Path(ckpt_dir) / name).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, target=target)


def restore_params(ckpt_path: str | Path, target_params: Any) -> Any:
    """Restore a bare param pytree saved with :func:`save`."""
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(Path(ckpt_path).absolute(), target=target_params)


def partial_restore(params: Any, loaded: dict, *, ignore_keys: list[str] = (),
                    only_subtree: str | None = None) -> Any:
    """Merge ``loaded`` (a possibly-partial param dict) into ``params``, skipping
    paths whose '/'-joined name starts with any ``ignore_keys`` entry — the
    functional version of the reference's ``init_from_ckpt``
    (ddpm.py:189-205). ``only_subtree`` restricts the merge to one top-level
    group (the reference's ``load_only_unet``)."""

    def path_str(path) -> str:
        return "/".join(str(getattr(k, "key", k)) for k in path)

    flat_loaded = {path_str(p): v
                   for p, v in jax.tree_util.tree_flatten_with_path(loaded)[0]}

    def merge(path, leaf):
        name = path_str(path)
        if only_subtree and not name.startswith(only_subtree):
            return leaf
        if any(name.startswith(ik) or f"/{ik}" in name for ik in ignore_keys):
            return leaf
        if name in flat_loaded and flat_loaded[name].shape == leaf.shape:
            return flat_loaded[name].astype(leaf.dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(merge, params)
