"""Dtype policy helpers.

The TPU inference policy: T3 backbone weights in bfloat16 (matmuls on the
MXU; the reference also ships torch_dtype=bfloat16 for the llama backbone,
ref: llama_configs.py:31), fp32 for norms' accumulation (handled inside
rms_norm/mha which upcast), CFM estimator + vocoder fp32 (the reference pins
the estimator to fp32, ref: s3gen.py:259).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_params(params, dtype=jnp.bfloat16, predicate=None):
    """Cast floating-point leaves to `dtype` (ints / bools untouched)."""
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            if predicate is None or predicate(x):
                return x.astype(dtype)
        return x
    return jax.tree.map(cast, params)


def param_count(params) -> int:
    return sum(x.size for x in jax.tree.leaves(params) if hasattr(x, "size"))


def param_bytes(params) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params)
               if hasattr(x, "size"))
