"""Prototype: block-diagonal-matmul decode attention (round-3 candidate).

The xplane traces show XLA's decode attention reads the KV cache at ~20 %
of HBM bandwidth (per-head batched matvecs don't map to the MXU). This
prototype reformulates the per-head matvec as TWO real MXU matmuls over a
COMBINED (T, H*D) cache layout:

  scores (TT, H) = K_tile (TT, HD) @ Qbd (HD, H)     Qbd[j,h] = q[h, j%D]
                                                      masked to j//D == h
  P_exp (TT, HD) = softmax_cols(scores) @ E (H, HD)   E[h,j] = (j//D == h)
  out (HD,)      = sum_t P_exp * V_tile               (VPU elementwise+reduce)

Flash accumulation across TT tiles. B=1, one kernel call per layer.
Run on the TPU: PYTHONPATH=".:$PYTHONPATH" python tools/perf_attn_bd.py [T]

MEASUREMENT STATUS (v5e, r2): the kernel is CORRECT (2e-4 vs the reference)
and measures ~4.5 us/layer standalone at T=512-2048. The in-loop XLA
numbers printed by this harness are NOT trustworthy — XLA hoists the
loop-invariant k/v transposes (and possibly more) out of the fori_loop, so
it reports 1.7-2.5 us/layer, while the xplane traces of the REAL decode
loop put XLA attention at ~8-12 us/layer. Next step (r3): wire the kernel
into _attn_core behind a flag (needs the combined (B, T, H*D) cache
layout) and compare END-TO-END tok/s — only that comparison decides.
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  __file__.rsplit("/", 2)[0] + "/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

H, D = 16, 64
HD = H * D
TT = 256


def _kernel(lt_ref, cl_ref, q_ref, k_ref, v_ref, out_ref, m_scr, l_scr,
            acc_scr):
    """Grid (T//TT,). Scalar-prefetch lt = last valid tile (index maps clamp
    to it, so tiles past cur_len repeat a block index and their DMA is
    SKIPPED — O(cur_len) HBM traffic). q (8, HD) row0 live; k/v (TT, HD)
    tiles; out (8, HD)."""
    t = pl.program_id(0)
    n_t = pl.num_programs(0)

    @pl.when(t == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    j = jax.lax.broadcasted_iota(jnp.int32, (HD, H), 0)
    h = jax.lax.broadcasted_iota(jnp.int32, (HD, H), 1)
    blk = (j // D) == h
    e = jnp.where(blk, 1.0, 0.0).T                    # (H, HD)

    @pl.when(t <= lt_ref[0])
    def _():
        qbd = jnp.where(blk, q_ref[0:1, :].T.astype(jnp.float32), 0.0)
        k = k_ref[:].astype(jnp.float32)              # (TT, HD)
        scores = jax.lax.dot_general(
            k, qbd, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * (1.0 / (D ** 0.5))  # (TT, H)
        pos = t * TT + jax.lax.broadcasted_iota(jnp.int32, (TT, H), 0)
        valid = pos <= cl_ref[0]
        scores = jnp.where(valid, scores, -jnp.inf)

        m_prev = m_scr[0:1, :H]                       # (1, H)
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=0, keepdims=True))
        m_new = jnp.maximum(m_new, -3.0e38)
        alpha = jnp.exp(m_prev - m_new)               # (1, H)
        p = jnp.exp(scores - m_new)                   # (TT, H)
        p = jnp.where(valid, p, 0.0)
        l_new = l_scr[0:1, :H] * alpha + jnp.sum(p, axis=0, keepdims=True)

        # expand p columns to the (TT, HD) layout with one MXU matmul
        p_exp = jax.lax.dot_general(
            p, e, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # (TT, HD)
        pv = jnp.sum(p_exp * v_ref[:].astype(jnp.float32), axis=0,
                     keepdims=True)                   # (1, HD)

        alpha_exp = jax.lax.dot_general(
            alpha, e, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # (1, HD)
        acc_scr[0:1, :] = acc_scr[0:1, :] * alpha_exp + pv
        m_scr[0:1, :H] = m_new
        l_scr[0:1, :H] = l_new

    @pl.when(t == n_t - 1)
    def _():
        l_exp = jax.lax.dot_general(
            jnp.maximum(l_scr[0:1, :H], 1e-30), e,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[:] = jnp.broadcast_to(acc_scr[0:1, :] / l_exp, out_ref.shape)


@functools.partial(jax.jit, static_argnames=())
def attn_bd(q, k, v, cur_len):
    """q (H, D); k/v (T, HD) combined layout; cur_len () -> out (H, D)."""
    T = k.shape[0]
    n_t = T // TT
    cur_len = cur_len.astype(jnp.int32)
    last_tile = jnp.minimum(cur_len // TT, n_t - 1).reshape(1)
    q8 = jnp.broadcast_to(q.reshape(1, HD), (8, HD))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_t,),
        in_specs=[
            pl.BlockSpec((8, HD), lambda t, lt, cl: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TT, HD), lambda t, lt, cl: (jnp.minimum(t, lt[0]), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TT, HD), lambda t, lt, cl: (jnp.minimum(t, lt[0]), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, HD), lambda t, lt, cl: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.VMEM((8, HD), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((8, HD), jnp.float32),
        grid_spec=grid_spec,
        interpret=jax.devices()[0].platform not in ("tpu", "axon"),
    )(last_tile, cur_len.reshape(1), q8,
      k.astype(jnp.bfloat16), v.astype(jnp.bfloat16))
    return out[0].reshape(H, D)


def xla_ref(q, k, v, cur_len):
    kk = k.reshape(-1, H, D).transpose(1, 0, 2)       # (H, T, D)
    vv = v.reshape(-1, H, D).transpose(1, 0, 2)
    s = jnp.einsum("hd,htd->ht", q, kk) / (D ** 0.5)
    T = k.shape[0]
    valid = jnp.arange(T)[None, :] <= cur_len
    s = jnp.where(valid, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("ht,htd->hd", p, vv)


if __name__ == "__main__":
    import sys
    rng = np.random.default_rng(0)
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    q = jnp.asarray(rng.standard_normal((H, D)).astype(np.float32)) * 0.3
    k = jnp.asarray(rng.standard_normal((T, HD)).astype(np.float32)) * 0.3
    v = jnp.asarray(rng.standard_normal((T, HD)).astype(np.float32)) * 0.3
    cl = jnp.asarray(min(371, T - 1))

    out = attn_bd(q, k, v, cl)
    ref = xla_ref(q, k.astype(jnp.bfloat16).astype(jnp.float32),
                  v.astype(jnp.bfloat16).astype(jnp.float32), cl)
    err = float(jnp.max(jnp.abs(out - ref)))
    print(f"max |bd - xla| = {err:.5f}")
    assert err < 2e-2, err

    # timing: 1000 chained calls per fetch (amortize the ~29 ms relay RTT)
    N_IT = 1000

    def chain(fn):
        @jax.jit
        def many(q, k, v, cl):
            def body(_, acc):
                # REAL data dependency (acc*0 would constant-fold and let
                # XLA hoist the call out of the loop)
                return fn(q + acc * 1e-30, k, v, cl)
            return jax.lax.fori_loop(0, N_IT, body, jnp.zeros((H, D)))
        return many

    noop = jax.jit(lambda x: x * 1.0)
    np.asarray(noop(q)); t0 = time.perf_counter(); np.asarray(noop(q))
    rtt = time.perf_counter() - t0
    for label, fn in (("bd-kernel", chain(attn_bd)), ("xla", chain(xla_ref))):
        np.asarray(fn(q, k, v, cl))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(q, k, v, cl))
            best = min(best, time.perf_counter() - t0)
        per = (best - rtt) / N_IT * 1e6
        print(f"{label}: {per:6.2f} us/layer-call (T={T}, rtt-subtracted)")
