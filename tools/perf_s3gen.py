"""Scratch: S3Gen fused-inference timing on TPU (meanflow turbo, 250 tokens)."""
import time
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from chatterbox_tpu.models.s3gen.model import S3GenEngine, s3gen_init, RefDict

rng = np.random.default_rng(0)
P = 125
ref = RefDict(
    prompt_token=rng.integers(0, 6561, (1, P)).astype(np.int32),
    prompt_token_len=np.asarray([P], np.int32),
    prompt_feat=rng.standard_normal((1, 2 * P, 80)).astype(np.float32) * 0.1,
    embedding=rng.standard_normal((1, 192)).astype(np.float32),
)
engine = S3GenEngine(s3gen_init(jax.random.key(2), meanflow=True), meanflow=True)
toks = rng.integers(0, 6561, (1, 250)).astype(np.int32)
np.asarray(jax.jit(lambda p: sum(jnp.sum(l.astype(jnp.float32))
                                 for l in jax.tree_util.tree_leaves(p)))(engine.params))
print("init drained", flush=True)

def timed(fn):
    out = fn()
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    return best

_noop = jax.jit(lambda x: x * 1.0)
_ones = jnp.ones((4,))
rtt = timed(lambda: _noop(_ones))
print(f"rtt {rtt*1e3:.1f} ms", flush=True)

t_f1 = timed(lambda: engine.inference(toks, ref, jax.random.key(6)))
print(f"fused pcm16:  {t_f1*1e3:7.1f} ms incl-rtt  (10 s audio -> {10/max(t_f1-rtt,1e-9):.1f}x)", flush=True)
