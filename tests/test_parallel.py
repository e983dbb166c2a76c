"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.sharding import NamedSharding, PartitionSpec as P

from chatterbox_tpu.models.t3.config import T3Config
from chatterbox_tpu.models.t3 import model as t3m
from chatterbox_tpu.parallel.mesh import make_mesh, shard_t3_params, replicate, shard_batch
from chatterbox_tpu.parallel.train import build_sharded_train_step
from chatterbox_tpu.sampling.batched import t3_generate_batched
from chatterbox_tpu.ops.sampling import SamplerParams


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest should provide 8 CPU devices"
    return make_mesh(8, dp=2)


class TestShardingRules:
    def test_tp_specs_applied(self, mesh):
        hp = T3Config.tiny_test("llama")
        params = t3m.t3_init(jax.random.key(0), hp)
        sharded = shard_t3_params(params, mesh)
        q = sharded["backbone"]["layers"][0]["q"]["w"]
        assert q.sharding.spec == P(None, "model")
        o = sharded["backbone"]["layers"][0]["o"]["w"]
        assert o.sharding.spec == P("model", None)
        # norms replicated
        g = sharded["backbone"]["layers"][0]["input_ln"]["g"]
        assert g.sharding.spec == P()


class TestShardedTrainStep:
    def test_one_step(self, mesh):
        hp = T3Config.tiny_test("llama")
        with mesh:
            step, init_state = build_sharded_train_step(hp, mesh)
            state = init_state(jax.random.key(0))
            B = 4
            cond = t3m.T3CondArrays(
                speaker_emb=shard_batch(jnp.zeros((B, 256)), mesh),
                cond_prompt_speech_tokens=shard_batch(
                    jnp.zeros((B, hp.speech_cond_prompt_len), jnp.int32), mesh),
                emotion_adv=shard_batch(0.5 * jnp.ones((B, 1, 1)), mesh),
            )
            text = shard_batch(jnp.ones((B, 8), jnp.int32), mesh)
            speech = shard_batch(jnp.ones((B, 10), jnp.int32), mesh)
            state, m = step(state, cond, text,
                            shard_batch(jnp.full((B,), 8, jnp.int32), mesh),
                            speech,
                            shard_batch(jnp.full((B,), 10, jnp.int32), mesh))
            assert np.isfinite(float(m["loss_text"]))
            assert np.isfinite(float(m["loss_speech"]))


class TestTensorParallelDecode:
    def test_tp_cfg_decode_token_identical(self, mesh):
        """Single-stream 520M-family CFG decode with weights sharded over
        the 'model' axis (dp2 x tp4): the latency-optimized deployment —
        one request, eight chips. XLA inserts the psum collectives from the
        param shardings; tokens must match the unsharded engine exactly."""
        from chatterbox_tpu.sampling.decode import t3_generate

        hp = T3Config.tiny_test("llama")
        params = t3m.t3_init(jax.random.key(0), hp)
        cond = t3m.T3CondArrays(
            speaker_emb=jnp.zeros((1, 256)),
            cond_prompt_speech_tokens=jnp.zeros(
                (1, hp.speech_cond_prompt_len), jnp.int32),
            emotion_adv=0.5 * jnp.ones((1, 1, 1)),
        )
        text = jnp.pad(jnp.arange(1, 9, dtype=jnp.int32)[None], ((0, 0), (0, 8)))
        sp = SamplerParams.make(temperature=0.8, top_p=1.0, min_p=0.05,
                                repetition_penalty=1.2, cfg_weight=0.5)
        args = (hp, cond, text, jnp.asarray(8), sp, jax.random.key(7))
        kw = dict(max_new_tokens=8, cfg_mode=True, ignore_eos=True)

        base = t3_generate(params, *args, **kw)
        with mesh:
            res = t3_generate(shard_t3_params(params, mesh), *args, **kw)
        np.testing.assert_array_equal(np.asarray(res.tokens),
                                      np.asarray(base.tokens))


class TestDataParallelServing:
    def test_batched_decode_dp_sharded(self):
        """Batched turbo decode with the request batch sharded over a pure
        data mesh (the BASELINE config-5 'batched serving on v5e-8' shape)."""
        devices = np.array(jax.devices()).reshape(8, 1)
        from jax.sharding import Mesh
        mesh = Mesh(devices, ("data", "model"))
        hp = T3Config.tiny_test("gpt2")
        params = t3m.t3_init(jax.random.key(0), hp)
        with mesh:
            params_r = replicate(params, mesh)
            B = 8
            cond = t3m.T3CondArrays(
                speaker_emb=shard_batch(jnp.zeros((B, 256)), mesh),
                cond_prompt_speech_tokens=shard_batch(
                    jnp.zeros((B, hp.speech_cond_prompt_len), jnp.int32), mesh),
                emotion_adv=None,
            )
            text = shard_batch(jnp.tile(jnp.arange(1, 7, dtype=jnp.int32)[None],
                                        (B, 1)), mesh)
            text = shard_batch(jnp.pad(text, ((0, 0), (0, 10))), mesh)
            lens = shard_batch(jnp.full((B,), 6, jnp.int32), mesh)
            keys = jax.random.split(jax.random.key(1), B)
            keys = shard_batch(keys.at[3].set(keys[0]), mesh)
            res = t3_generate_batched(
                params_r, hp, cond, text, lens,
                SamplerParams.make(cfg_weight=0.0), keys,
                max_new_tokens=6, top_k=40, ignore_eos=True)
            toks = np.asarray(res.tokens)
            assert toks.shape == (8, 6)
            assert (toks < hp.speech_tokens_dict_size).all()
            # rows with identical input + identical per-row key → identical output
            np.testing.assert_array_equal(toks[0], toks[3])
