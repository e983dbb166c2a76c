"""Speculative decode: draft-propose / target-verify correctness.

The speculative sampler must preserve the target model's distribution. Two
exact checks make that testable without statistics:
  * greedy (top_k=1): acceptance degenerates to argmax agreement and the
    output must be TOKEN-IDENTICAL to the sequential target decode;
  * draft == target: p == q, so (nearly) every draft token is accepted.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chatterbox_tpu.models.t3.config import T3Config
from chatterbox_tpu.models.t3 import model as t3m
from chatterbox_tpu.ops.sampling import SamplerParams
from chatterbox_tpu.sampling.decode import t3_generate
from chatterbox_tpu.sampling.speculative import t3_generate_speculative


@pytest.fixture(scope="module")
def setup():
    hp = T3Config.tiny_test("gpt2")
    params = t3m.t3_init(jax.random.key(0), hp)
    draft = t3m.t3_init(jax.random.key(1), hp)
    cond = t3m.T3CondArrays(
        speaker_emb=jnp.zeros((1, 256)),
        cond_prompt_speech_tokens=jnp.zeros((1, hp.speech_cond_prompt_len),
                                            jnp.int32),
        emotion_adv=None,
    )
    text = jnp.pad(jnp.arange(1, 9, dtype=jnp.int32)[None], ((0, 0), (0, 8)))
    tlen = jnp.asarray(8)
    return hp, params, draft, cond, text, tlen


class TestSpeculative:
    def test_greedy_token_identical(self, setup):
        hp, params, draft, cond, text, tlen = setup
        sp = SamplerParams.make(temperature=0.8, top_p=1.0,
                                repetition_penalty=1.2, cfg_weight=0.0)
        seq = t3_generate(params, hp, cond, text, tlen, sp, jax.random.key(2),
                          max_new_tokens=24, top_k=1, cfg_mode=False)
        spec = t3_generate_speculative(
            params, draft, hp, hp, cond, cond, text, tlen, sp,
            jax.random.key(3), max_new_tokens=24, n_draft=4, top_k=1)
        assert int(spec.n_tokens) == int(seq.n_tokens)
        np.testing.assert_array_equal(np.asarray(spec.tokens),
                                      np.asarray(seq.tokens))

    def test_greedy_identical_any_k(self, setup):
        hp, params, draft, cond, text, tlen = setup
        sp = SamplerParams.make(temperature=0.8, top_p=1.0,
                                repetition_penalty=1.2, cfg_weight=0.0)
        seq = t3_generate(params, hp, cond, text, tlen, sp, jax.random.key(2),
                          max_new_tokens=17, top_k=1, cfg_mode=False)
        for k in (1, 3, 7):
            spec = t3_generate_speculative(
                params, draft, hp, hp, cond, cond, text, tlen, sp,
                jax.random.key(4), max_new_tokens=17, n_draft=k, top_k=1)
            np.testing.assert_array_equal(np.asarray(spec.tokens),
                                          np.asarray(seq.tokens),
                                          err_msg=f"K={k}")

    def test_self_draft_accepts(self, setup):
        """draft == target → p == q (up to slab-vs-step fp noise) → the
        acceptance rate must be ~1 and rounds ~ n_tokens / (K+1)."""
        hp, params, _, cond, text, tlen = setup
        sp = SamplerParams.make(temperature=0.8, top_p=0.95,
                                repetition_penalty=1.2, cfg_weight=0.0)
        spec = t3_generate_speculative(
            params, params, hp, hp, cond, cond, text, tlen, sp,
            jax.random.key(5), max_new_tokens=32, n_draft=4, top_k=50,
            ignore_eos=True)
        assert int(spec.n_tokens) == 32
        rate = int(spec.n_accepted) / max(int(spec.n_drafted), 1)
        assert rate > 0.8, f"self-draft acceptance {rate}"
        # every accepted draft saves a round: rounds well under n_tokens
        assert int(spec.n_rounds) <= 12

    def test_quantized_self_draft_acceptance(self, setup):
        """draft := int8-quantized target (tools/perf_spec.py --quant-draft):
        the draft/target gap is only the quantization error, so acceptance
        must sit far above the independent-draft floor (~0 on random
        weights) — this is the correlated-draft regime the DESIGN.md
        speculative verdict is based on."""
        from chatterbox_tpu.utils.quantize import quantize_tree
        hp, params, _, cond, text, tlen = setup
        qdraft = dict(params)
        qdraft["backbone"] = dict(params["backbone"])
        # tiny-config weights are below quantize_t3_backbone's min_size
        # cutoff; quantize with min_size=1 so the draft really is perturbed
        qdraft["backbone"]["layers"] = quantize_tree(
            params["backbone"]["layers"], min_size=1, mode="int8")
        assert "w_q" in str(jax.tree_util.tree_structure(
            qdraft["backbone"]["layers"]))  # perturbation actually applied
        sp = SamplerParams.make(temperature=0.8, top_p=0.95,
                                repetition_penalty=1.2, cfg_weight=0.0)
        spec = t3_generate_speculative(
            params, qdraft, hp, hp, cond, cond, text, tlen, sp,
            jax.random.key(8), max_new_tokens=32, n_draft=4, top_k=50,
            ignore_eos=True)
        assert int(spec.n_tokens) == 32
        rate = int(spec.n_accepted) / max(int(spec.n_drafted), 1)
        assert rate > 0.5, f"quantized-self-draft acceptance {rate}"

    def test_sampling_valid_stream(self, setup):
        hp, params, draft, cond, text, tlen = setup
        sp = SamplerParams.make(temperature=0.8, top_p=0.95,
                                repetition_penalty=1.2, cfg_weight=0.0)
        spec = t3_generate_speculative(
            params, draft, hp, hp, cond, cond, text, tlen, sp,
            jax.random.key(6), max_new_tokens=20, n_draft=4, top_k=50)
        toks = np.asarray(spec.tokens)
        n = int(spec.n_tokens)
        assert 0 < n <= 20
        assert (toks >= 0).all() and (toks < hp.speech_tokens_dict_size).all()
        # stop-padded beyond n_tokens
        assert (toks[n:] == hp.stop_speech_token).all()
        # no non-stop token after an EOS inside the counted stream
        eos = np.flatnonzero(toks[:n] == hp.stop_speech_token)
        if eos.size:
            assert eos[0] == n - 1

    def test_deterministic(self, setup):
        hp, params, draft, cond, text, tlen = setup
        sp = SamplerParams.make(temperature=0.8, top_p=0.95,
                                repetition_penalty=1.2, cfg_weight=0.0)
        a = t3_generate_speculative(
            params, draft, hp, hp, cond, cond, text, tlen, sp,
            jax.random.key(7), max_new_tokens=16, n_draft=3, top_k=50)
        b = t3_generate_speculative(
            params, draft, hp, hp, cond, cond, text, tlen, sp,
            jax.random.key(7), max_new_tokens=16, n_draft=3, top_k=50)
        np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(b.tokens))
