"""Scratch: HiFT stage decomposition on TPU (T=500 mel frames = 10 s)."""
import time, functools
import numpy as np, jax, jax.numpy as jnp
from chatterbox_tpu.models.s3gen import hift as H
from chatterbox_tpu.nn import core as nn

params = H.hift_init(jax.random.key(0))
np.asarray(jax.jit(lambda p: sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(p)))(params))
B, T = 1, 500
mel = jnp.asarray(np.random.default_rng(0).standard_normal((B, T, 80)).astype(np.float32) * 0.1)

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
ones = jnp.ones((4,))
rtt = timed(noop, ones)
print(f"rtt {rtt*1e3:.1f} ms", flush=True)

f_f0 = jax.jit(lambda p, m: H.f0_predictor_apply(p["f0_predictor"], m))
f0 = f_f0(params, mel)
f_f0_sum = jax.jit(lambda p, m: jnp.sum(H.f0_predictor_apply(p["f0_predictor"], m)))
t_f0 = timed(f_f0_sum, params, mel) - rtt

f_src = jax.jit(lambda p, f0: H.hift_source(p, jax.random.key(1), f0))
s = f_src(params, f0)
f_src_sum = jax.jit(lambda p, f0: jnp.sum(H.hift_source(p, jax.random.key(1), f0)))
t_src = timed(f_src_sum, params, f0) - rtt

f_dec = jax.jit(lambda p, m, s: jnp.sum(H.hift_decode(p, m, s)))
t_dec = timed(f_dec, params, mel, s) - rtt

# decode sub-stages
def dec_prefix(p, mel, s, n_stages):
    from chatterbox_tpu.audio.stft import stft_real_imag
    re, im = stft_real_imag(s[..., 0], H.ISTFT_NFFT, H.ISTFT_HOP, H._hift_window, center=True)
    s_stft = jnp.swapaxes(jnp.concatenate([re, im], axis=-2), -1, -2)
    x = nn.conv1d(p["conv_pre"], mel, padding=3)
    down_cum = (15, 3, 1)
    for i in range(n_stages):
        u, k = H.UPSAMPLE_RATES[i], H.UPSAMPLE_KERNELS[i]
        x = nn.leaky_relu(x, 0.1)
        x = nn.conv_transpose1d(p["ups"][i], x, stride=u, k=k, padding=(k - u) // 2)
        if i == len(H.UPSAMPLE_RATES) - 1:
            x = jnp.concatenate([x[:, 1:2], x], axis=1)
        dc = down_cum[i]
        si = (nn.conv1d(p["source_downs"][i], s_stft) if dc == 1 else
              nn.conv1d(p["source_downs"][i], s_stft, stride=dc, padding=dc // 2))
        si = H._resblock_apply(p["source_resblocks"][i], si,
                               H.SOURCE_RES_KERNELS[i], H.RES_DILATIONS[i])
        x = x + si
        acc = None
        for j in range(len(H.RES_KERNELS)):
            r = H._resblock_apply(p["resblocks"][i * 3 + j], x,
                                  H.RES_KERNELS[j], H.RES_DILATIONS[j])
            acc = r if acc is None else acc + r
        x = acc / 3
    return jnp.sum(x)

ts = []
for n in (0, 1, 2, 3):
    f = jax.jit(functools.partial(dec_prefix, n_stages=n))
    ts.append(timed(f, params, mel, s) - rtt)

print(f"f0 predictor: {t_f0*1e3:7.1f} ms")
print(f"source:       {t_src*1e3:7.1f} ms")
print(f"decode total: {t_dec*1e3:7.1f} ms")
print(f"  stft+conv_pre: {ts[0]*1e3:6.1f} ms")
print(f"  stage0 (T=4k, 256ch): {(ts[1]-ts[0])*1e3:6.1f} ms")
print(f"  stage1 (T=20k, 128ch): {(ts[2]-ts[1])*1e3:6.1f} ms")
print(f"  stage2 (T=60k, 64ch): {(ts[3]-ts[2])*1e3:6.1f} ms")
print(f"  istft head: {(t_dec-ts[3])*1e3:6.1f} ms")
