"""Checkpointing: orbax save/restore with epoch retention + auto-resume.

Counterpart of the reference's mmcv CheckpointHook + auto-resume glob
(/root/reference/tools/train.py:156-166, config `checkpoint_config` at
FocalFormer3D_L.py:355) and the partial-loading paths `load_from` /
`load_img_from` (tools/train.py:268-293) used for staged training
(DeformFormer3D -> FocalFormer3D; image branch from DeformFormer3D_C_R50).
"""
from __future__ import annotations

import re
from pathlib import Path
from typing import Any, Optional, Sequence

import jax
import numpy as np


def _to_numpy(tree: Any) -> Any:
    return jax.tree_util.tree_map(np.asarray, tree)


def save_checkpoint(
    work_dir: str,
    state: Any,
    epoch: int,
    keep_last: Optional[int] = None,
    meta: Optional[dict] = None,
) -> str:
    """Write epoch_{N} via orbax; optionally prune old epochs."""
    import orbax.checkpoint as ocp

    work = Path(work_dir).absolute()
    work.mkdir(parents=True, exist_ok=True)
    path = work / f"epoch_{epoch}"
    ckptr = ocp.StandardCheckpointer()
    payload = {"state": _to_numpy(state)}
    if meta:
        payload["meta"] = meta
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    if keep_last is not None:
        epochs = sorted(list_epochs(work_dir))
        for e in epochs[:-keep_last]:
            import shutil

            shutil.rmtree(work / f"epoch_{e}", ignore_errors=True)
    return str(path)


def list_epochs(work_dir: str) -> Sequence[int]:
    work = Path(work_dir)
    if not work.exists():
        return []
    out = []
    for p in work.iterdir():
        m = re.fullmatch(r"epoch_(\d+)", p.name)
        if m and p.is_dir():
            out.append(int(m.group(1)))
    return sorted(out)


def restore_checkpoint(path: str, target: Any) -> Any:
    """Restore a state pytree (structure/dtypes taken from `target`)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    payload = {"state": _to_numpy(target)}
    restored = ckptr.restore(Path(path).absolute(), payload)
    return restored["state"]


def auto_resume(work_dir: str, target: Any):
    """(state, epoch): restore the newest epoch_* if any, else (target, 0).

    Mirrors the reference auto-resume glob (tools/train.py:156-166)."""
    epochs = list_epochs(work_dir)
    if not epochs:
        return target, 0
    e = epochs[-1]
    state = restore_checkpoint(str(Path(work_dir) / f"epoch_{e}"), target)
    return state, e


def load_partial_params(
    params: Any,
    source_params: Any,
    key_filter=None,
) -> Any:
    """Non-strict partial load: copy leaves whose path exists in both trees
    (and passes `key_filter(path_str)`), keep the rest.

    Replaces the reference's `load_img_from` filtered state-dict load
    (tools/train.py:268-280: keys starting with img_* / imgpts_neck.cam_lss).
    """
    src_flat = {
        _path_str(p): v
        for p, v in jax.tree_util.tree_flatten_with_path(source_params)[0]
    }

    def merge(path, leaf):
        s = _path_str(path)
        if s in src_flat and (key_filter is None or key_filter(s)):
            src = src_flat[s]
            if np.shape(src) == np.shape(leaf):
                return np.asarray(src, dtype=np.asarray(leaf).dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(merge, params)


def img_branch_filter(path: str) -> bool:
    """Selects the image-branch subtrees (load_img_from semantics)."""
    return path.startswith(
        ("img_backbone", "img_neck", "imgpts_neck/cam_lss")
    )


def _path_str(path) -> str:
    return "/".join(
        str(getattr(p, "key", getattr(p, "idx", p))) for p in path
    )
