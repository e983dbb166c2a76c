"""Scratch: flow stage decomposition on TPU (turbo meanflow shapes, bucket 384)."""
import time
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from chatterbox_tpu.models.s3gen.flow import (flow_init, FlowDims,
                                              TOKEN_MEL_RATIO)
from chatterbox_tpu.models.s3gen.encoder import upsample_encoder_apply
from chatterbox_tpu.models.s3gen.cfm import cfm_inference
from chatterbox_tpu.nn import core as nn

dims = FlowDims()
params = flow_init(jax.random.key(0), meanflow=True, dims=dims)
np.asarray(jax.jit(lambda p: sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(p)))(params))
print("init done", flush=True)

B, T_tok = 1, 384
rng = np.random.default_rng(0)
token = jnp.asarray(rng.integers(0, 6561, (B, T_tok)).astype(np.int32))
token_len = jnp.asarray([375])
emb_in = None

def timed(fn, *args):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    return best

noop = jax.jit(lambda x: x * 1.0)
rtt = timed(noop, jnp.ones((4,)))
print(f"rtt {rtt*1e3:.1f} ms", flush=True)

@jax.jit
def enc(params, token, token_len):
    mask_tok = jnp.arange(T_tok)[None] < token_len[:, None]
    x = nn.embedding(params["input_embedding"], token) * mask_tok[..., None]
    h, h_lens = upsample_encoder_apply(params["encoder"], x, token_len,
                                       d=dims.enc_dim, n_heads=dims.enc_heads)
    return jnp.sum(nn.linear(params["encoder_proj"], h))
t_enc = timed(enc, params, token, token_len) - rtt
print(f"encoder (6+4 blocks, {T_tok}->{2*T_tok}): {t_enc*1e3:6.1f} ms", flush=True)

T_mel = T_tok * TOKEN_MEL_RATIO
mu = jnp.asarray(rng.standard_normal((B, T_mel, 80)).astype(np.float32) * 0.1)
mask = jnp.ones((B, T_mel), bool)
spks = jnp.asarray(rng.standard_normal((B, 80)).astype(np.float32) * 0.1)
conds = jnp.zeros((B, T_mel, 80))
noise = jax.random.normal(jax.random.key(1), (B, T_mel, 80))

for steps in (1, 2):
    f = jax.jit(lambda p, mu, key: jnp.sum(cfm_inference(
        p["decoder"], mu, mask, spks, conds, key, n_timesteps=steps,
        meanflow=True, noise=noise, prompt_len=None, n_heads=dims.unet_heads)))
    t = timed(f, params, mu, jax.random.key(2)) - rtt
    print(f"meanflow CFM {steps} step(s): {t*1e3:6.1f} ms", flush=True)
