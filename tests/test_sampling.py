"""Logits-processor parity vs HuggingFace transformers implementations."""
import numpy as np
import torch
import jax.numpy as jnp

from chatterbox_tpu.ops import sampling as S


def _logits(seed=0, v=128, b=1):
    torch.manual_seed(seed)
    return torch.randn(b, v) * 3.0


class TestProcessors:
    def test_repetition_penalty(self):
        from transformers.generation.logits_process import RepetitionPenaltyLogitsProcessor
        logits = _logits(0)
        ids = torch.tensor([[3, 7, 7, 100]])
        ref = RepetitionPenaltyLogitsProcessor(1.3)(ids, logits.clone()).numpy()
        seen = np.zeros(128, bool)
        seen[[3, 7, 100]] = True
        ours = S.apply_repetition_penalty(jnp.asarray(logits.numpy()), jnp.asarray(seen), 1.3)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-6)

    def test_top_p(self):
        from transformers.generation.logits_process import TopPLogitsWarper
        for seed, p in [(1, 0.95), (2, 0.5), (3, 0.05)]:
            logits = _logits(seed)
            ref = TopPLogitsWarper(top_p=p)(None, logits.clone()).numpy()
            ours = np.asarray(S.apply_top_p(jnp.asarray(logits.numpy()), p))
            ref_kept = ref > -1e30
            ours_kept = ours > -1e30
            np.testing.assert_array_equal(ours_kept, ref_kept)
            np.testing.assert_allclose(ours[ours_kept], ref[ref_kept], atol=1e-6)

    def test_top_k(self):
        from transformers.generation.logits_process import TopKLogitsWarper
        logits = _logits(4)
        ref = TopKLogitsWarper(top_k=10)(None, logits.clone()).numpy()
        ours = np.asarray(S.apply_top_k(jnp.asarray(logits.numpy()), 10))
        np.testing.assert_array_equal(ours > -1e30, ref > -1e30)

    def test_min_p(self):
        from transformers.generation.logits_process import MinPLogitsWarper
        for seed, p in [(5, 0.05), (6, 0.3)]:
            logits = _logits(seed)
            ref = MinPLogitsWarper(min_p=p)(torch.tensor([[0]]), logits.clone()).numpy()
            ours = np.asarray(S.apply_min_p(jnp.asarray(logits.numpy()), p))
            np.testing.assert_array_equal(ours > -1e30, ref > -1e30)

    def test_cfg_combine(self):
        c = jnp.asarray(np.array([1.0, 2.0]))
        u = jnp.asarray(np.array([0.5, 3.0]))
        out = np.asarray(S.cfg_combine(c, u, 0.5))
        np.testing.assert_allclose(out, [1.25, 1.5])

    def test_fused_turbo_chain_matches_unfused(self):
        """The single-sort turbo pipeline must equal the op-by-op chain for
        scalar and per-row sampler params, with and without top_k."""
        rng = np.random.default_rng(0)
        for b, v, k in [(1, 128, 40), (4, 6563, 1000), (3, 257, 0),
                        (2, 64, 64)]:
            logits = jnp.asarray(rng.standard_normal((b, v)) * 4.0, jnp.float32)
            seen = jnp.asarray(rng.random((b, v)) < 0.1)
            for sp in [
                S.SamplerParams.make(temperature=0.8, top_p=0.95,
                                     repetition_penalty=1.2, cfg_weight=0.0),
                S.SamplerParams(
                    temperature=jnp.asarray(rng.uniform(0.5, 2.0, (b, 1)), jnp.float32),
                    top_p=jnp.asarray(rng.uniform(0.5, 1.0, (b, 1)), jnp.float32),
                    min_p=jnp.zeros((b, 1), jnp.float32),
                    repetition_penalty=jnp.asarray(rng.uniform(1.0, 1.6, (b, 1)), jnp.float32),
                    cfg_weight=jnp.zeros((b, 1), jnp.float32)),
            ]:
                got = np.asarray(S.process_logits_turbo(logits, seen, sp, k))
                want = np.asarray(S.process_logits_turbo_unfused(logits, seen, sp, k))
                np.testing.assert_allclose(got, want, atol=1e-5,
                                           err_msg=f"b={b} v={v} k={k}")

    def test_categorical_respects_filtering(self):
        import jax
        logits = jnp.full((128,), S.NEG_INF)
        logits = logits.at[5].set(1.0).at[17].set(1.0)
        keys = jax.random.split(jax.random.key(0), 200)
        samples = jax.vmap(lambda k: S.sample_categorical(k, logits))(keys)
        assert set(np.asarray(samples).tolist()) <= {5, 17}
        assert len(set(np.asarray(samples).tolist())) == 2
