"""Native checkpoint format: chatterbox_tpu pytrees ↔ safetensors.

The reference only *loads* checkpoints (SURVEY.md §5 "Checkpoint/resume:
load-only"). The TPU build adds save/restore of its own converted pytrees so
conversion happens once — subsequent loads are a flat safetensors read.
Pytree paths are flattened to '/'-joined keys (list indices as numbers).
"""
from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import jax


def _key(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def save_pytree(params, path):
    from safetensors.numpy import save_file
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    tensors = {_key(p): np.asarray(v) for p, v in flat}
    save_file(tensors, str(path))


def load_pytree(path, template):
    """Load into the structure of `template` (same tree that was saved)."""
    from safetensors.numpy import load_file
    tensors = load_file(str(path))
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for p, tmpl in flat:
        k = _key(p)
        if k not in tensors:
            raise KeyError(f"checkpoint {path} missing key {k}")
        leaves.append(tensors[k])
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_engine_checkpoint(out_dir, *, t3_params=None, s3gen_params=None,
                           ve_params=None, meta: dict | None = None):
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    if t3_params is not None:
        save_pytree(t3_params, out / "t3_native.safetensors")
    if s3gen_params is not None:
        save_pytree(s3gen_params, out / "s3gen_native.safetensors")
    if ve_params is not None:
        save_pytree(ve_params, out / "ve_native.safetensors")
    if meta:
        (out / "chatterbox_tpu.json").write_text(json.dumps(meta, indent=2))
