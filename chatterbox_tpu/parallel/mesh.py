"""Device mesh + sharding rules (jax.sharding / pjit).

The reference has no distributed execution at all (SURVEY.md §2.6) — its
`device` is a plain string. The TPU build scales two ways:
  * data parallel: independent requests sharded over the "data" axis
    (batched serving, the BASELINE config-5 path);
  * tensor parallel: T3's attention heads + MLP intermediate sharded over
    the "model" axis for the 520M family (optional — single chip fits it).
Collectives are inserted by XLA from the shardings (psum over "model" after
o/down projections, etc.); they ride ICI on a single slice.
"""
from __future__ import annotations

import re
from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, dp: Optional[int] = None) -> Mesh:
    """Create a (data, model) mesh over the available devices."""
    devices = np.array(jax.devices())
    n = n_devices or len(devices)
    devices = devices[:n]
    if dp is None:
        dp = 2 if n >= 4 else n
    mp = n // dp
    return Mesh(devices.reshape(dp, mp), ("data", "model"))


# ---------------------------------------------------------------------------
# T3 parameter sharding rules
# ---------------------------------------------------------------------------

_T3_RULES = [
    # llama attention / mlp: column-parallel in, row-parallel out
    (r".*\bbackbone\b.*\b(q|k|v|gate|up)\b.*\bw$", P(None, "model")),
    (r".*\bbackbone\b.*\b(o|down)\b.*\bw$", P("model", None)),
    # gpt2 fused qkv + mlp
    (r".*\bbackbone\b.*\b(qkv|fc_in)\b.*\bw$", P(None, "model")),
    (r".*\bbackbone\b.*\b(qkv|fc_in)\b.*\bb$", P("model")),
    (r".*\bbackbone\b.*\b(attn_out|fc_out)\b.*\bw$", P("model", None)),
    # embeddings / heads: shard the vocab axis
    (r".*\b(text_emb|speech_emb|text_pos_emb|speech_pos_emb|wpe)\b.*\bw$", P(None)),
    (r".*\b(text_head|speech_head)\b.*\bw$", P(None, "model")),
]


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def t3_param_spec(path, leaf) -> P:
    s = _path_str(path).replace("/", " ")
    # token-ize path for \b matching
    for pattern, spec in _T3_RULES:
        if re.match(pattern, s):
            return spec
    return P()  # replicate


def shard_t3_params(params: dict, mesh: Mesh) -> dict:
    """Place T3 params on the mesh under the TP rules."""
    def place(path, leaf):
        spec = t3_param_spec(path, leaf)
        # drop specs that don't divide the dims evenly → replicate
        try:
            return jax.device_put(leaf, NamedSharding(mesh, spec))
        except Exception:
            return jax.device_put(leaf, NamedSharding(mesh, P()))
    return jax.tree_util.tree_map_with_path(place, params)


def replicate(tree, mesh: Mesh):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)


def shard_batch(tree, mesh: Mesh):
    """Shard the leading (batch) axis over "data"."""
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P("data"))), tree)
