"""Fused GPT-2 decode-layer kernels (ops/fused_layer.py) — interpret-mode
parity against exact mirror references and the unfused int4 decode path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chatterbox_tpu.ops.fused_layer import (
    TK, TW, ln_qkv_int4, attnout_ln_mlp_int4, fused_gpt2_supported,
    _unpack, _layer_norm_f32, _gelu_new_f32,
)
from chatterbox_tpu.utils.quantize import (
    quantize_linear_weight_int4, quantize_linear_weight_int4_colsplit,
    quantize_t3_backbone, unpack_int4,
)
from chatterbox_tpu.ops.int4_matmul import matmul_int4c_xla

D, I = 512, 2048
EPS = 1e-5


def _row_matmul_ref(x, wp, s_lo, s_hi):
    """Exact mirror of the kernels' row-split int4 dot (bf16 operands,
    f32 accumulation, post-dot group scales)."""
    K2, N = wp.shape
    lo, hi = _unpack(wp)
    out = jnp.zeros((x.shape[0], N), jnp.float32)
    for g in range(K2 // TK):
        xl = x[:, g * TK:(g + 1) * TK].astype(jnp.bfloat16)
        xh = x[:, K2 + g * TK:K2 + (g + 1) * TK].astype(jnp.bfloat16)
        out += jax.lax.dot_general(
            xl, lo[g * TK:(g + 1) * TK], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * s_lo[g]
        out += jax.lax.dot_general(
            xh, hi[g * TK:(g + 1) * TK], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * s_hi[g]
    return out


def _col_matmul_ref(x, wpc, s_lo, s_hi):
    """Mirror of the col-split int4 dot: returns (B, 2*NH) f32."""
    K, NH = wpc.shape
    lo, hi = _unpack(wpc)
    uA = jnp.zeros((x.shape[0], NH), jnp.float32)
    uB = jnp.zeros((x.shape[0], NH), jnp.float32)
    for g in range(K // TK):
        xg = x[:, g * TK:(g + 1) * TK].astype(jnp.bfloat16)
        uA += jax.lax.dot_general(
            xg, lo[g * TK:(g + 1) * TK], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * s_lo[g]
        uB += jax.lax.dot_general(
            xg, hi[g * TK:(g + 1) * TK], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * s_hi[g]
    return jnp.concatenate([uA, uB], axis=-1)


class TestColSplitPacking:
    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.standard_normal((D, I)).astype(np.float32)) * 0.02
        wpc, s_lo, s_hi = quantize_linear_weight_int4_colsplit(w)
        assert wpc.shape == (D, I // 2)
        lo, hi = unpack_int4(wpc)
        n_g = s_lo.shape[0]
        g = D // n_g
        w_lo = (np.asarray(lo).reshape(n_g, g, I // 2)
                * np.asarray(s_lo)[:, None, :]).reshape(D, I // 2)
        w_hi = (np.asarray(hi).reshape(n_g, g, I // 2)
                * np.asarray(s_hi)[:, None, :]).reshape(D, I // 2)
        w_rec = np.concatenate([w_lo, w_hi], axis=1)
        # int4 with 15 levels: group-max relative error bounded by 1/14
        err = np.abs(w_rec - np.asarray(w))
        bound = np.asarray(jnp.repeat(jnp.concatenate(
            [s_lo, s_hi], axis=1), g, axis=0)) * 0.5 + 1e-8
        assert (err <= bound).mean() > 0.999

    def test_xla_matmul_matches_dequant(self):
        rng = np.random.default_rng(1)
        w = jnp.asarray(rng.standard_normal((D, I)).astype(np.float32)) * 0.02
        x = jnp.asarray(rng.standard_normal((3, D)).astype(np.float32))
        wpc, s_lo, s_hi = quantize_linear_weight_int4_colsplit(w)
        y = matmul_int4c_xla(x, wpc, s_lo, s_hi)
        ref = _col_matmul_ref(x, wpc, s_lo, s_hi)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=2e-2, atol=2e-2)


class TestKernelA:
    def test_ln_qkv_matches_mirror(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((2, D)).astype(np.float32)
                        ).astype(jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((D, 3 * D)).astype(np.float32)) * 0.02
        b = jnp.asarray(rng.standard_normal((3 * D,)).astype(np.float32)) * 0.01
        g = jnp.asarray(1.0 + 0.1 * rng.standard_normal(D).astype(np.float32))
        be = jnp.asarray(0.1 * rng.standard_normal(D).astype(np.float32))
        wp, s_lo, s_hi = quantize_linear_weight_int4(w)
        b8 = jnp.broadcast_to(b[None], (8, 3 * D))
        g8 = jnp.broadcast_to(g[None], (8, D))
        be8 = jnp.broadcast_to(be[None], (8, D))
        out = ln_qkv_int4(x, g8, be8, wp, s_lo, s_hi, b8, eps=EPS)

        y = _layer_norm_f32(x.astype(jnp.float32), g[None], be[None], EPS)
        ref = _row_matmul_ref(y, wp, s_lo, s_hi) + b[None]
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)


class TestKernelB:
    def test_attnout_ln_mlp_matches_mirror(self):
        rng = np.random.default_rng(3)
        B = 2
        a = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32) * 0.5
                        ).astype(jnp.bfloat16)
        xres = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32)
                           ).astype(jnp.bfloat16)
        wo = jnp.asarray(rng.standard_normal((D, D)).astype(np.float32)) * 0.02
        bo = jnp.asarray(rng.standard_normal((D,)).astype(np.float32)) * 0.01
        g2 = jnp.asarray(1.0 + 0.1 * rng.standard_normal(D).astype(np.float32))
        be2 = jnp.asarray(0.1 * rng.standard_normal(D).astype(np.float32))
        w1 = jnp.asarray(rng.standard_normal((D, I)).astype(np.float32)) * 0.02
        b1 = jnp.asarray(rng.standard_normal((I,)).astype(np.float32)) * 0.01
        w2 = jnp.asarray(rng.standard_normal((I, D)).astype(np.float32)) * 0.02
        b2 = jnp.asarray(rng.standard_normal((D,)).astype(np.float32)) * 0.01

        wo_p, so_lo, so_hi = quantize_linear_weight_int4(wo)
        w1c, s1_lo, s1_hi = quantize_linear_weight_int4_colsplit(w1)
        w2p, s2_lo, s2_hi = quantize_linear_weight_int4(w2)
        bc = lambda v: jnp.broadcast_to(v[None], (8, v.shape[0]))
        out = attnout_ln_mlp_int4(
            a, xres, wo_p, so_lo, so_hi, bc(bo), bc(g2), bc(be2),
            w1c, s1_lo, s1_hi, bc(b1), w2p, s2_lo, s2_hi, bc(b2), eps=EPS)

        # mirror
        proj = _row_matmul_ref(a, wo_p, so_lo, so_hi)
        r = xres.astype(jnp.float32) + proj + bo[None]
        y2 = _layer_norm_f32(r, g2[None], be2[None], EPS)
        u = _col_matmul_ref(y2, w1c, s1_lo, s1_hi) + b1[None]
        h = _gelu_new_f32(u).astype(jnp.bfloat16).astype(jnp.float32)
        ref = r + b2[None] + _row_matmul_ref(h, w2p, s2_lo, s2_hi)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-3, atol=1e-3)


class TestBackboneIntegration:
    def _params_and_inputs(self):
        from chatterbox_tpu.models.t3.config import T3Config
        from chatterbox_tpu.models.t3 import model as t3m
        hp = T3Config(
            text_tokens_dict_size=64, backbone_name="GPT2_fused_test",
            speech_tokens_dict_size=6564, input_pos_emb=None,
            speech_cond_prompt_len=8, use_perceiver_resampler=False,
            emotion_adv=False, max_text_tokens=64, max_speech_tokens=128)
        params = t3m.t3_init(jax.random.key(0), hp)
        return hp, params

    def test_fused_decode_step_matches_unfused_int4(self):
        from chatterbox_tpu.models.t3 import backbone as bb
        hp, params = self._params_and_inputs()
        cfg = hp.backbone
        assert fused_gpt2_supported(cfg)
        qp = quantize_t3_backbone(params, mode="int4_fused",
                                  ln_eps=cfg.layer_norm_eps)
        fused_layers = qp["backbone"]["layers"]
        # unfused twin: same quantized weights, "fused" operands stripped
        unfused_layers = [{k: v for k, v in lp.items() if k != "fused"}
                          for lp in fused_layers]

        B, t_max = 1, 32
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.standard_normal((B, 1, cfg.hidden_size))
                        .astype(np.float32) * 0.3)
        pos = jnp.full((B, 1), 5, jnp.int32)
        cache = bb.KVCache.zeros(cfg, B, t_max)
        k0 = jax.random.normal(jax.random.key(1),
                               cache.k.shape, jnp.float32) * 0.2
        cache = bb.KVCache(k0.astype(cache.k.dtype), (k0 * 0.5).astype(cache.v.dtype))
        start = jnp.asarray(5, jnp.int32)
        mask = bb.decode_mask(t_max, jnp.full((B,), 5, jnp.int32))

        h_f, c_f = bb.backbone_apply_unrolled(
            {"layers": fused_layers, "wpe": qp["backbone"]["wpe"],
             "ln_f": qp["backbone"]["ln_f"]}, cfg, x, pos, cache, start, mask)
        h_u, c_u = bb.backbone_apply_unrolled(
            {"layers": unfused_layers, "wpe": qp["backbone"]["wpe"],
             "ln_f": qp["backbone"]["ln_f"]}, cfg, x, pos, cache, start, mask)

        np.testing.assert_allclose(np.asarray(h_f), np.asarray(h_u),
                                   rtol=5e-2, atol=5e-2)
        np.testing.assert_allclose(np.asarray(c_f.k), np.asarray(c_u.k),
                                   rtol=5e-2, atol=5e-2)

    def test_fused_generate_runs_and_matches_unfused_greedy(self):
        """Greedy decode: fused and unfused int4 paths should pick the same
        tokens (identical weights; only f32-vs-bf16 op ordering differs)."""
        from chatterbox_tpu.models.t3 import model as t3m
        from chatterbox_tpu.sampling.decode import t3_generate
        from chatterbox_tpu.ops.sampling import SamplerParams
        hp, params = self._params_and_inputs()
        cfg = hp.backbone
        qp = quantize_t3_backbone(params, mode="int4_fused",
                                  ln_eps=cfg.layer_norm_eps)
        up = dict(qp)
        up["backbone"] = dict(qp["backbone"])
        up["backbone"]["layers"] = [
            {k: v for k, v in lp.items() if k != "fused"}
            for lp in qp["backbone"]["layers"]]

        cond = t3m.T3CondArrays(
            speaker_emb=jnp.zeros((1, 256)),
            cond_prompt_speech_tokens=jnp.zeros(
                (1, hp.speech_cond_prompt_len), jnp.int32),
            emotion_adv=None)
        text = jnp.zeros((1, 8), jnp.int32)
        sp = SamplerParams.make(temperature=1e-4, top_p=1.0,
                                repetition_penalty=1.0, cfg_weight=0.0)
        kw = dict(max_new_tokens=6, top_k=0, cfg_mode=False, ignore_eos=True)
        r_f = t3_generate(qp, hp, cond, text, jnp.asarray(6), sp,
                          jax.random.key(7), **kw)
        r_u = t3_generate(up, hp, cond, text, jnp.asarray(6), sp,
                          jax.random.key(7), **kw)
        assert np.isfinite(np.asarray(r_f.tokens)).all()
        np.testing.assert_array_equal(np.asarray(r_f.tokens),
                                      np.asarray(r_u.tokens))


class TestInt8Fused:
    def test_ln_qkv_int8_matches_xla(self):
        from chatterbox_tpu.ops.fused_layer import ln_qkv_int8, _layer_norm_f32
        from chatterbox_tpu.utils.quantize import quantize_linear_weight
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.standard_normal((2, D)).astype(np.float32)
                        ).astype(jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((D, 3 * D)).astype(np.float32)) * 0.02
        b = jnp.asarray(rng.standard_normal((3 * D,)).astype(np.float32)) * 0.01
        g = jnp.asarray(1.0 + 0.1 * rng.standard_normal(D).astype(np.float32))
        be = jnp.asarray(0.1 * rng.standard_normal(D).astype(np.float32))
        w_q, s = quantize_linear_weight(w)
        bc = lambda v: jnp.broadcast_to(v[None], (8, v.shape[0]))
        out = ln_qkv_int8(x, bc(g), bc(be), w_q, bc(s), bc(b), eps=EPS)
        y = _layer_norm_f32(x.astype(jnp.float32), g[None], be[None], EPS)
        ref = jax.lax.dot_general(
            y.astype(jnp.bfloat16), w_q.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * s[None] + b[None]
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-3, atol=2e-3)

    def test_rms_qkv_int8_matches_xla(self):
        from chatterbox_tpu.ops.fused_layer import rms_qkv_int8, _rms_norm_f32
        from chatterbox_tpu.utils.quantize import quantize_linear_weight
        rng = np.random.default_rng(6)
        x = jnp.asarray(rng.standard_normal((2, D)).astype(np.float32)
                        ).astype(jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((D, 3 * D)).astype(np.float32)) * 0.02
        g = jnp.asarray(1.0 + 0.1 * rng.standard_normal(D).astype(np.float32))
        w_q, s = quantize_linear_weight(w)
        bc = lambda v: jnp.broadcast_to(v[None], (8, v.shape[0]))
        out = rms_qkv_int8(x, bc(g), w_q, bc(s), eps=EPS)
        y = _rms_norm_f32(x.astype(jnp.float32), g[None], EPS)
        ref = jax.lax.dot_general(
            y.astype(jnp.bfloat16), w_q.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * s[None]
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-3, atol=2e-3)

    def test_attnout_rms_glu_int8_matches_xla(self):
        from chatterbox_tpu.ops.fused_layer import (
            attnout_rms_glu_int8, _rms_norm_f32, _silu_f32)
        from chatterbox_tpu.utils.quantize import quantize_linear_weight
        rng = np.random.default_rng(7)
        B, I_ = 2, 1024
        a = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32) * 0.5
                        ).astype(jnp.bfloat16)
        xres = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32)
                           ).astype(jnp.bfloat16)
        mk = lambda shape: jnp.asarray(
            rng.standard_normal(shape).astype(np.float32)) * 0.02
        wo, wg, wu, wd = mk((D, D)), mk((D, I_)), mk((D, I_)), mk((I_, D))
        g2 = jnp.asarray(1.0 + 0.1 * rng.standard_normal(D).astype(np.float32))
        qo, so = quantize_linear_weight(wo)
        qg, sg = quantize_linear_weight(wg)
        qu, su = quantize_linear_weight(wu)
        qd, sd = quantize_linear_weight(wd)
        bc = lambda v: jnp.broadcast_to(v[None], (8, v.shape[0]))
        out = attnout_rms_glu_int8(a, xres, qo, bc(so), bc(g2),
                                   qg, bc(sg), qu, bc(su), qd, bc(sd),
                                   eps=EPS, tw=512)
        # mirror
        d = lambda x_, w_: jax.lax.dot_general(
            x_.astype(jnp.bfloat16), w_.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        r = xres.astype(jnp.float32) + d(a, qo) * so[None]
        y2 = _rms_norm_f32(r, g2[None], EPS)
        ug = d(y2, qg) * sg[None]
        uu = d(y2, qu) * su[None]
        h = (_silu_f32(ug) * uu).astype(jnp.bfloat16)
        # the kernel applies Wd per 512-wide phase; mirror that split
        ref = r.copy()
        for j in range(I_ // 512):
            sl = slice(j * 512, (j + 1) * 512)
            ref = ref + d(h[:, sl], qd[sl]) * sd[None]
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-3, atol=2e-3)

    def test_fused_llama_generate_matches_unfused_greedy(self):
        from chatterbox_tpu.models.t3.config import T3Config
        from chatterbox_tpu.models.t3 import model as t3m
        from chatterbox_tpu.sampling.decode import t3_generate
        from chatterbox_tpu.ops.sampling import SamplerParams
        from chatterbox_tpu.ops.fused_layer import fused_llama_supported
        from chatterbox_tpu.utils.quantize import (quantize_t3_backbone,
                                                   best_serving_mode)
        hp = T3Config(
            text_tokens_dict_size=64, backbone_name="Llama_fused_test",
            speech_tokens_dict_size=6564, input_pos_emb="learned",
            speech_cond_prompt_len=8, use_perceiver_resampler=False,
            emotion_adv=True, max_text_tokens=64, max_speech_tokens=128)
        assert fused_llama_supported(hp.backbone)
        assert best_serving_mode(hp.backbone) == "int8_fused"
        params = t3m.t3_init(jax.random.key(0), hp)
        qp = quantize_t3_backbone(params, mode="int8_fused")
        up = dict(qp)
        up["backbone"] = dict(qp["backbone"])
        up["backbone"]["layers"] = [
            {k: v for k, v in lp.items() if k != "fused"}
            for lp in qp["backbone"]["layers"]]
        cond = t3m.T3CondArrays(
            speaker_emb=jnp.zeros((1, 256)),
            cond_prompt_speech_tokens=jnp.zeros(
                (1, hp.speech_cond_prompt_len), jnp.int32),
            emotion_adv=0.5 * jnp.ones((1, 1, 1)))
        text = jnp.zeros((1, 8), jnp.int32)
        sp = SamplerParams.make(temperature=1e-4, top_p=1.0,
                                repetition_penalty=1.0, cfg_weight=0.5)
        kw = dict(max_new_tokens=6, cfg_mode=True, ignore_eos=True)
        r_f = t3_generate(qp, hp, cond, text, jnp.asarray(6), sp,
                          jax.random.key(7), **kw)
        r_u = t3_generate(up, hp, cond, text, jnp.asarray(6), sp,
                          jax.random.key(7), **kw)
        assert np.isfinite(np.asarray(r_f.tokens)).all()
        np.testing.assert_array_equal(np.asarray(r_f.tokens),
                                      np.asarray(r_u.tokens))

    def test_fused_int8_generate_matches_unfused_greedy(self):
        from chatterbox_tpu.models.t3.config import T3Config
        from chatterbox_tpu.models.t3 import model as t3m
        from chatterbox_tpu.sampling.decode import t3_generate
        from chatterbox_tpu.ops.sampling import SamplerParams
        from chatterbox_tpu.utils.quantize import quantize_t3_backbone
        hp = T3Config(
            text_tokens_dict_size=64, backbone_name="GPT2_fused_test",
            speech_tokens_dict_size=6564, input_pos_emb=None,
            speech_cond_prompt_len=8, use_perceiver_resampler=False,
            emotion_adv=False, max_text_tokens=64, max_speech_tokens=128)
        params = t3m.t3_init(jax.random.key(0), hp)
        qp = quantize_t3_backbone(params, mode="int8_fused")
        up = dict(qp)
        up["backbone"] = dict(qp["backbone"])
        up["backbone"]["layers"] = [
            {k: v for k, v in lp.items() if k != "fused"}
            for lp in qp["backbone"]["layers"]]
        cond = t3m.T3CondArrays(
            speaker_emb=jnp.zeros((1, 256)),
            cond_prompt_speech_tokens=jnp.zeros(
                (1, hp.speech_cond_prompt_len), jnp.int32),
            emotion_adv=None)
        text = jnp.zeros((1, 8), jnp.int32)
        sp = SamplerParams.make(temperature=1e-4, top_p=1.0,
                                repetition_penalty=1.0, cfg_weight=0.0)
        kw = dict(max_new_tokens=6, top_k=0, cfg_mode=False, ignore_eos=True)
        r_f = t3_generate(qp, hp, cond, text, jnp.asarray(6), sp,
                          jax.random.key(7), **kw)
        r_u = t3_generate(up, hp, cond, text, jnp.asarray(6), sp,
                          jax.random.key(7), **kw)
        assert np.isfinite(np.asarray(r_f.tokens)).all()
        np.testing.assert_array_equal(np.asarray(r_f.tokens),
                                      np.asarray(r_u.tokens))


class TestLargeTiles:
    """Pin the 1024-wide tile branch of _qkv_tiles — the configuration the
    real models (D=1024) actually take (interpret mode)."""

    def test_ln_qkv_int8_d1024(self):
        from chatterbox_tpu.ops.fused_layer import (ln_qkv_int8,
                                                    _layer_norm_f32,
                                                    _qkv_tiles)
        from chatterbox_tpu.utils.quantize import quantize_linear_weight
        D1 = 1024
        assert _qkv_tiles(D1, 3 * D1) == (1024, 1024)
        rng = np.random.default_rng(10)
        x = jnp.asarray(rng.standard_normal((2, D1)).astype(np.float32)
                        ).astype(jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((D1, 3 * D1)).astype(np.float32)) * 0.02
        b = jnp.asarray(rng.standard_normal((3 * D1,)).astype(np.float32)) * 0.01
        g = jnp.asarray(1.0 + 0.1 * rng.standard_normal(D1).astype(np.float32))
        be = jnp.asarray(0.1 * rng.standard_normal(D1).astype(np.float32))
        w_q, s = quantize_linear_weight(w)
        bc = lambda v: jnp.broadcast_to(v[None], (8, v.shape[0]))
        out = ln_qkv_int8(x, bc(g), bc(be), w_q, bc(s), bc(b), eps=EPS)
        y = _layer_norm_f32(x.astype(jnp.float32), g[None], be[None], EPS)
        ref = jax.lax.dot_general(
            y.astype(jnp.bfloat16), w_q.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * s[None] + b[None]
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-3, atol=2e-3)

    def test_rms_qkv_int8_d1024(self):
        from chatterbox_tpu.ops.fused_layer import (rms_qkv_int8,
                                                    _rms_norm_f32)
        from chatterbox_tpu.utils.quantize import quantize_linear_weight
        D1 = 1024
        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.standard_normal((2, D1)).astype(np.float32)
                        ).astype(jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((D1, 3 * D1)).astype(np.float32)) * 0.02
        g = jnp.asarray(1.0 + 0.1 * rng.standard_normal(D1).astype(np.float32))
        w_q, s = quantize_linear_weight(w)
        bc = lambda v: jnp.broadcast_to(v[None], (8, v.shape[0]))
        out = rms_qkv_int8(x, bc(g), w_q, bc(s), eps=EPS)
        y = _rms_norm_f32(x.astype(jnp.float32), g[None], EPS)
        ref = jax.lax.dot_general(
            y.astype(jnp.bfloat16), w_q.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * s[None]
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-3, atol=2e-3)
