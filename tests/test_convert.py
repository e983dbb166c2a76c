"""Weight-converter round-trip tests: take real reference torch modules,
convert their state_dicts with convert/weights.py, and check numeric parity
of full forwards. This validates the exact name mapping used for the
published checkpoints.
"""
import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from chatterbox_tpu.convert import weights as W
from tests.ref_loader import load_ref_module


def _prefix_sd(module, prefix):
    return {f"{prefix}{k}": v.detach().float().numpy()
            for k, v in module.state_dict().items()}


class TestHiFTConvert:
    def test_roundtrip(self):
        hifigan = load_ref_module("chatterbox.models.s3gen.hifigan")
        f0p = load_ref_module("chatterbox.models.s3gen.f0_predictor")
        torch.manual_seed(0)
        m = hifigan.HiFTGenerator(
            sampling_rate=24000, upsample_rates=[8, 5, 3],
            upsample_kernel_sizes=[16, 11, 7],
            source_resblock_kernel_sizes=[7, 7, 11],
            source_resblock_dilation_sizes=[[1, 3, 5]] * 3,
            f0_predictor=f0p.ConvRNNF0Predictor(),
        ).eval()
        sd = _prefix_sd(m, "mel2wav.")
        params = W.convert_hift(sd)
        from chatterbox_tpu.models.s3gen import hift as H
        T = 8
        torch.manual_seed(1)
        mel = torch.randn(1, 80, T) * 0.5
        src = torch.randn(1, 1, T * 480) * 0.05
        with torch.no_grad():
            ref_wav, _ = m.inference(speech_feat=mel, cache_source=src)
        ours = H.hift_decode(params, jnp.asarray(mel.transpose(1, 2).numpy()),
                             jnp.asarray(src.transpose(1, 2).numpy()))
        np.testing.assert_allclose(np.asarray(ours), ref_wav.numpy(), atol=2e-3)


class TestEncoderConvert:
    def test_roundtrip(self):
        ue = load_ref_module("chatterbox.models.s3gen.transformer.upsample_encoder")
        torch.manual_seed(2)
        m = ue.UpsampleConformerEncoder(
            output_size=512, attention_heads=8, linear_units=2048, num_blocks=2,
            dropout_rate=0.0, positional_dropout_rate=0.0, attention_dropout_rate=0.0,
            normalize_before=True, input_layer='linear',
            pos_enc_layer_type='rel_pos_espnet', selfattention_layer_type='rel_selfattn',
            input_size=512, use_cnn_module=False, macaron_style=False,
        ).eval()
        # trim up_encoders to 2 for speed
        m.up_encoders = torch.nn.ModuleList(list(m.up_encoders)[:2])
        sd = _prefix_sd(m, "flow.encoder.")
        params = W.convert_upsample_encoder(sd)
        from chatterbox_tpu.models.s3gen import encoder as enc
        torch.manual_seed(3)
        x = torch.randn(1, 10, 512)
        with torch.no_grad():
            ref, _ = m(x, torch.tensor([10]))
        ours, _ = enc.upsample_encoder_apply(params, jnp.asarray(x.numpy()),
                                             jnp.asarray([10]))
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=5e-4)


@pytest.fixture(scope="module")
def tiny_ref_t3():
    """Full reference T3 with a tiny llama backbone injected into its config
    registry (no perceiver — the reference perceiver hardcodes 1024 dims)."""
    cfgs = load_ref_module("chatterbox.models.t3.llama_configs")
    cfgs.LLAMA_CONFIGS["Llama_tiny_test"] = dict(
        vocab_size=8, max_position_embeddings=4096, hidden_size=64,
        intermediate_size=256, num_hidden_layers=2, num_attention_heads=4,
        attn_implementation="eager", head_dim=16, tie_word_embeddings=False,
        hidden_act="silu", attention_bias=False, attention_dropout=0.0,
        initializer_range=0.02, mlp_bias=False, model_type="llama",
        num_key_value_heads=4, pretraining_tp=1, rms_norm_eps=1e-05,
        rope_scaling=dict(factor=8.0, high_freq_factor=4.0, low_freq_factor=1.0,
                          original_max_position_embeddings=8192, rope_type="llama3"),
        rope_theta=500000.0, use_cache=True,
    )
    t3c = load_ref_module("chatterbox.models.t3.modules.t3_config")
    hp = t3c.T3Config(text_tokens_dict_size=64)
    hp.llama_config_name = "Llama_tiny_test"
    hp.speech_tokens_dict_size = 80
    hp.use_perceiver_resampler = False
    hp.speech_cond_prompt_len = 8
    hp.start_text_token = 2   # keep special ids inside the tiny vocab
    t3mod = load_ref_module("chatterbox.models.t3.t3")
    torch.manual_seed(4)
    m = t3mod.T3(hp).eval()
    return m, hp


class TestT3Convert:
    def test_teacher_forced_parity(self, tiny_ref_t3):
        m, ref_hp = tiny_ref_t3
        sd = {k: v.detach().float().numpy() for k, v in m.state_dict().items()}
        from chatterbox_tpu.models.t3.config import T3Config
        hp = T3Config(
            text_tokens_dict_size=64, backbone_name="Llama_tiny_test",
            speech_tokens_dict_size=80, input_pos_emb="learned",
            speech_cond_prompt_len=8, use_perceiver_resampler=False,
            emotion_adv=True, start_text_token=2,
        )
        params = W.convert_t3(sd, hp)

        from chatterbox_tpu.models.t3 import model as t3m
        cond_mod = load_ref_module("chatterbox.models.t3.modules.cond_enc")
        torch.manual_seed(5)
        spk = torch.randn(1, 256)
        prompt = torch.randint(0, 80, (1, 8))
        emo = 0.5 * torch.ones(1, 1, 1)
        t3cond = cond_mod.T3Cond(speaker_emb=spk, cond_prompt_speech_tokens=prompt,
                                 emotion_adv=emo)
        text = torch.randint(1, 64, (1, 10))
        text[0, 0] = ref_hp.start_text_token
        text[0, -1] = ref_hp.stop_text_token
        speech = torch.randint(0, 80, (1, 12))

        with torch.no_grad():
            ref_out = m.forward(
                t3_cond=t3cond, text_tokens=text,
                text_token_lens=torch.tensor([10]),
                speech_tokens=speech, speech_token_lens=torch.tensor([12]),
                training=True,
            )

        cond = t3m.T3CondArrays(
            speaker_emb=jnp.asarray(spk.numpy()),
            cond_prompt_speech_tokens=jnp.asarray(prompt.numpy()),
            emotion_adv=jnp.asarray(emo.numpy()),
        )
        tl, sl = t3m.t3_forward(params, hp, cond, jnp.asarray(text.numpy()),
                                jnp.asarray(speech.numpy()))
        np.testing.assert_allclose(np.asarray(sl), ref_out.speech_logits.numpy(),
                                   atol=1e-3)
        np.testing.assert_allclose(np.asarray(tl), ref_out.text_logits.numpy(),
                                   atol=1e-3)

    def test_cond_embeds_parity(self, tiny_ref_t3):
        m, _ = tiny_ref_t3
        sd = {k: v.detach().float().numpy() for k, v in m.state_dict().items()}
        from chatterbox_tpu.models.t3.config import T3Config
        hp = T3Config(
            text_tokens_dict_size=64, backbone_name="Llama_tiny_test",
            speech_tokens_dict_size=80, input_pos_emb="learned",
            speech_cond_prompt_len=8, use_perceiver_resampler=False,
            emotion_adv=True,
        )
        params = W.convert_t3(sd, hp)
        from chatterbox_tpu.models.t3 import model as t3m
        cond_mod = load_ref_module("chatterbox.models.t3.modules.cond_enc")
        torch.manual_seed(6)
        spk = torch.randn(1, 256)
        prompt = torch.randint(0, 80, (1, 8))
        emo = 0.7 * torch.ones(1, 1, 1)
        t3cond = cond_mod.T3Cond(speaker_emb=spk, cond_prompt_speech_tokens=prompt,
                                 emotion_adv=emo)
        with torch.no_grad():
            ref = m.prepare_conditioning(t3cond).numpy()
        cond = t3m.T3CondArrays(jnp.asarray(spk.numpy()),
                                jnp.asarray(prompt.numpy()),
                                jnp.asarray(emo.numpy()))
        ours = t3m.cond_embeds(params, hp, cond)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4)


class TestPerceiverConvert:
    def test_perceiver_parity_real_dims(self):
        """Golden parity at the real 520M dims (1024-d, 4 heads, 32 queries)
        — the reference module is real-size-only
        (ref: models/t3/modules/perceiver.py:173-213)."""
        pmod = load_ref_module("chatterbox.models.t3.modules.perceiver")
        torch.manual_seed(11)
        ref = pmod.Perceiver().eval()                    # defaults: 1024/4/32
        sd = {f"cond_enc.perceiver.{k}": v.detach().numpy()
              for k, v in ref.state_dict().items()}
        params = W.convert_perceiver(sd, "cond_enc.perceiver")

        from chatterbox_tpu.models.t3.model import perceiver_apply
        h = torch.randn(2, 150, 1024)
        with torch.no_grad():
            ref_out = ref(h).numpy()
        ours = perceiver_apply(jax.tree.map(jnp.asarray, params),
                               jnp.asarray(h.numpy()))
        np.testing.assert_allclose(np.asarray(ours), ref_out, atol=1e-3)

    def test_cond_enc_with_perceiver_real_dims(self):
        """Full reference T3CondEnc (520M config, use_perceiver_resampler=True,
        ref: cond_enc.py:41-97) vs our converted cond-enc assembly: speaker
        projection ⊕ perceiver(prompt embeds) ⊕ emotion token."""
        cond_mod = load_ref_module("chatterbox.models.t3.modules.cond_enc")
        tcfg_mod = load_ref_module("chatterbox.models.t3.modules.t3_config")
        torch.manual_seed(13)
        enc = cond_mod.T3CondEnc(tcfg_mod.T3Config()).eval()   # 1024-d real dims
        sd = {f"cond_enc.{k}": v.detach().numpy()
              for k, v in enc.state_dict().items()}

        spk = torch.randn(2, 256)
        prompt_emb = torch.randn(2, 150, 1024)
        emo = 0.4 * torch.ones(2, 1, 1)
        t3cond = cond_mod.T3Cond(speaker_emb=spk,
                                 cond_prompt_speech_tokens=torch.zeros(2, 150).long(),
                                 cond_prompt_speech_emb=prompt_emb,
                                 emotion_adv=emo)
        with torch.no_grad():
            ref = enc(t3cond).numpy()

        from chatterbox_tpu.nn import core as nn_core
        from chatterbox_tpu.models.t3.model import perceiver_apply
        spkr_p = W.lin(sd, "cond_enc.spkr_enc")
        emo_p = W.lin(sd, "cond_enc.emotion_adv_fc")
        perc_p = jax.tree.map(jnp.asarray, W.convert_perceiver(sd, "cond_enc.perceiver"))
        spkr = nn_core.linear(spkr_p, jnp.asarray(spk.numpy()))[:, None]
        pe = perceiver_apply(perc_p, jnp.asarray(prompt_emb.numpy()))
        emo_tok = nn_core.linear(emo_p, jnp.asarray(emo.numpy()).reshape(-1, 1, 1))
        ours = jnp.concatenate([spkr, pe, emo_tok], axis=1)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-3)


class TestVEConvert:
    def test_lstm_shapes(self):
        torch.manual_seed(7)
        lstm = torch.nn.LSTM(40, 256, num_layers=3, batch_first=True)
        proj = torch.nn.Linear(256, 256)
        sd = {f"lstm.{k}": v.detach().numpy() for k, v in lstm.state_dict().items()}
        sd.update({f"proj.{k}": v.detach().numpy() for k, v in proj.state_dict().items()})
        sd["similarity_weight"] = np.asarray([10.0])
        sd["similarity_bias"] = np.asarray([-5.0])
        params = W.convert_voice_encoder(sd)
        from chatterbox_tpu.models.ve.model import ve_forward
        x = torch.randn(2, 160, 40)
        with torch.no_grad():
            _, (h, _) = lstm(x)
            raw = torch.relu(proj(h[-1]))
            ref = (raw / raw.norm(dim=1, keepdim=True)).numpy()
        ours = ve_forward(params, jnp.asarray(x.numpy()))
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4)


@pytest.fixture(scope="module")
def tiny_ref_t3_gpt2():
    """Full reference T3 with a tiny GPT-2 backbone (the Turbo/Nano family)."""
    cfgs = load_ref_module("chatterbox.models.t3.llama_configs")
    cfgs.LLAMA_CONFIGS["GPT2_tiny_ref"] = {
        "activation_function": "gelu_new", "attn_pdrop": 0.0, "embd_pdrop": 0.0,
        "resid_pdrop": 0.0, "bos_token_id": 0, "eos_token_id": 0,
        "initializer_range": 0.02, "layer_norm_epsilon": 1e-05,
        "model_type": "gpt2", "n_ctx": 256, "n_embd": 64, "hidden_size": 64,
        "n_head": 4, "n_layer": 2, "n_positions": 256, "vocab_size": 96,
    }
    t3c = load_ref_module("chatterbox.models.t3.modules.t3_config")
    hp = t3c.T3Config(text_tokens_dict_size=96)
    hp.llama_config_name = "GPT2_tiny_ref"
    hp.speech_tokens_dict_size = 80
    hp.input_pos_emb = None
    hp.speech_cond_prompt_len = 8
    hp.use_perceiver_resampler = False
    hp.emotion_adv = False
    hp.start_text_token = 2
    t3mod = load_ref_module("chatterbox.models.t3.t3")
    torch.manual_seed(8)
    m = t3mod.T3(hp).eval()
    return m, hp


class TestT3ConvertGPT2:
    def test_teacher_forced_parity(self, tiny_ref_t3_gpt2):
        m, ref_hp = tiny_ref_t3_gpt2
        sd = {k: v.detach().float().numpy() for k, v in m.state_dict().items()}
        from chatterbox_tpu.models.t3.config import T3Config, BackboneConfig, BACKBONES
        tiny = BackboneConfig(family="gpt2", hidden_size=64, num_layers=2,
                              num_heads=4, head_dim=16, intermediate_size=256,
                              max_positions=256, vocab_size=96)
        BACKBONES["GPT2_tiny_ref"] = tiny
        hp = T3Config(
            text_tokens_dict_size=96, backbone_name="GPT2_tiny_ref",
            speech_tokens_dict_size=80, input_pos_emb=None,
            speech_cond_prompt_len=8, use_perceiver_resampler=False,
            emotion_adv=False, start_text_token=2,
        )
        params = W.convert_t3(sd, hp)
        from chatterbox_tpu.models.t3 import model as t3m
        cond_mod = load_ref_module("chatterbox.models.t3.modules.cond_enc")
        torch.manual_seed(9)
        spk = torch.randn(1, 256)
        prompt = torch.randint(0, 80, (1, 8))
        t3cond = cond_mod.T3Cond(speaker_emb=spk, cond_prompt_speech_tokens=prompt,
                                 emotion_adv=None)
        text = torch.randint(1, 96, (1, 9))
        text[0, 0] = 2
        text[0, -1] = 0
        speech = torch.randint(0, 80, (1, 11))
        with torch.no_grad():
            ref_out = m.forward(t3_cond=t3cond, text_tokens=text,
                                text_token_lens=torch.tensor([9]),
                                speech_tokens=speech,
                                speech_token_lens=torch.tensor([11]),
                                training=True)
        cond = t3m.T3CondArrays(jnp.asarray(spk.numpy()),
                                jnp.asarray(prompt.numpy()), None)
        tl, sl = t3m.t3_forward(params, hp, cond, jnp.asarray(text.numpy()),
                                jnp.asarray(speech.numpy()))
        np.testing.assert_allclose(np.asarray(sl), ref_out.speech_logits.numpy(),
                                   atol=1e-3)


class _GreedyTorch:
    """Monkeypatch torch.multinomial → argmax so the reference sampling
    loops become deterministic-greedy (paired with a near-zero temperature
    on the JAX side, where argmax dominates the categorical gumbel noise)."""

    def __enter__(self):
        self._orig = torch.multinomial
        torch.multinomial = (
            lambda probs, num_samples=1, **kw: probs.argmax(dim=-1,
                                                            keepdim=True))
        return self

    def __exit__(self, *exc):
        torch.multinomial = self._orig


class TestFreeRunningParity:
    """Token-identical A/B of the COMPOSED decode loops against the
    reference's own `T3.inference` / `T3.inference_turbo` (greedy): this is
    the only test level that sees KV-cache round-trips, the double-BOS CFG
    prefix (ref: t3.py:258-268 + 305-313), EOS/position bookkeeping, and the
    processor-chain ordering ACROSS steps — per-module goldens can't."""

    @pytest.fixture(scope="class")
    def ref_llama_inf(self):
        cfgs = load_ref_module("chatterbox.models.t3.llama_configs")
        cfgs.LLAMA_CONFIGS["Llama_tiny_inf"] = dict(
            vocab_size=8, max_position_embeddings=4096, hidden_size=64,
            intermediate_size=256, num_hidden_layers=2, num_attention_heads=4,
            attn_implementation="eager", head_dim=16,
            tie_word_embeddings=False, hidden_act="silu",
            attention_bias=False, attention_dropout=0.0,
            initializer_range=0.02, mlp_bias=False, model_type="llama",
            num_key_value_heads=4, pretraining_tp=1, rms_norm_eps=1e-05,
            rope_scaling=dict(factor=8.0, high_freq_factor=4.0,
                              low_freq_factor=1.0,
                              original_max_position_embeddings=8192,
                              rope_type="llama3"),
            rope_theta=500000.0, use_cache=True,
        )
        t3c = load_ref_module("chatterbox.models.t3.modules.t3_config")
        hp = t3c.T3Config(text_tokens_dict_size=64)
        hp.llama_config_name = "Llama_tiny_inf"
        hp.speech_tokens_dict_size = 80
        hp.use_perceiver_resampler = False
        hp.speech_cond_prompt_len = 8
        hp.start_text_token = 2
        # free-running needs the speech specials INSIDE the tiny vocab
        hp.start_speech_token = 75
        hp.stop_speech_token = 76
        t3mod = load_ref_module("chatterbox.models.t3.t3")
        torch.manual_seed(4)
        return t3mod.T3(hp).eval(), hp

    @pytest.fixture(scope="class")
    def ref_gpt2_inf(self):
        cfgs = load_ref_module("chatterbox.models.t3.llama_configs")
        cfgs.LLAMA_CONFIGS["GPT2_tiny_inf"] = {
            "activation_function": "gelu_new", "attn_pdrop": 0.0,
            "embd_pdrop": 0.0, "resid_pdrop": 0.0, "bos_token_id": 0,
            "eos_token_id": 0, "initializer_range": 0.02,
            "layer_norm_epsilon": 1e-05, "model_type": "gpt2", "n_ctx": 256,
            "n_embd": 64, "hidden_size": 64, "n_head": 4, "n_layer": 2,
            "n_positions": 256, "vocab_size": 96,
        }
        t3c = load_ref_module("chatterbox.models.t3.modules.t3_config")
        hp = t3c.T3Config(text_tokens_dict_size=96)
        hp.llama_config_name = "GPT2_tiny_inf"
        hp.speech_tokens_dict_size = 80
        hp.input_pos_emb = None
        hp.speech_cond_prompt_len = 8
        hp.use_perceiver_resampler = False
        hp.emotion_adv = False
        hp.start_text_token = 2
        hp.start_speech_token = 75
        hp.stop_speech_token = 76
        t3mod = load_ref_module("chatterbox.models.t3.t3")
        torch.manual_seed(8)
        return t3mod.T3(hp).eval(), hp

    def test_cfg_inference_token_identical(self, ref_llama_inf):
        """Greedy free-running CFG loop vs the reference's T3.inference
        (ref: t3.py:225-390), invoked exactly as ChatterboxTTS.generate
        does (duplicated SOT/EOT-framed text, cfg_weight=0.5)."""
        m, ref_hp = ref_llama_inf
        from chatterbox_tpu.models.t3.config import (T3Config, BackboneConfig,
                                                     BACKBONES)
        from chatterbox_tpu.models.t3 import model as t3m
        from chatterbox_tpu.sampling.decode import t3_generate
        from chatterbox_tpu.ops.sampling import SamplerParams
        BACKBONES["Llama_tiny_inf"] = BackboneConfig(
            family="llama", hidden_size=64, num_layers=2, num_heads=4,
            head_dim=16, intermediate_size=256, num_kv_heads=4)
        hp = T3Config(text_tokens_dict_size=64,
                      backbone_name="Llama_tiny_inf",
                      speech_tokens_dict_size=80, input_pos_emb="learned",
                      speech_cond_prompt_len=8,
                      use_perceiver_resampler=False, emotion_adv=True,
                      start_text_token=2, start_speech_token=75,
                      stop_speech_token=76)
        sd = {k: v.detach().float().numpy() for k, v in m.state_dict().items()}
        params = W.convert_t3(sd, hp)
        cond_mod = load_ref_module("chatterbox.models.t3.modules.cond_enc")
        torch.manual_seed(5)
        spk = torch.randn(1, 256)
        prompt = torch.randint(0, 80, (1, 8))
        emo = 0.5 * torch.ones(1, 1, 1)
        t3cond = cond_mod.T3Cond(speaker_emb=spk,
                                 cond_prompt_speech_tokens=prompt,
                                 emotion_adv=emo)
        ids = torch.randint(3, 64, (1, 10))
        # the pipeline duplicates text for CFG then frames (ref: tts.py:237-243)
        text = torch.nn.functional.pad(torch.cat([ids, ids], 0), (1, 0),
                                       value=ref_hp.start_text_token)
        text = torch.nn.functional.pad(text, (0, 1),
                                       value=ref_hp.stop_text_token)
        K = 12
        with _GreedyTorch(), torch.inference_mode():
            ref_toks = m.inference(t3_cond=t3cond, text_tokens=text,
                                   max_new_tokens=K, temperature=1e-4,
                                   cfg_weight=0.5)
        cond = t3m.T3CondArrays(
            speaker_emb=jnp.asarray(spk.numpy()),
            cond_prompt_speech_tokens=jnp.asarray(prompt.numpy()),
            emotion_adv=jnp.asarray(emo.numpy()))
        framed = np.zeros((1, 32), np.int32)
        ft = text[0].numpy()
        framed[0, : len(ft)] = ft
        sp = SamplerParams.make(temperature=1e-4, top_p=0.95, min_p=0.05,
                                repetition_penalty=1.2, cfg_weight=0.5)
        res = t3_generate(params, hp, cond, jnp.asarray(framed),
                          jnp.asarray(len(ft)), sp, jax.random.key(0),
                          max_new_tokens=K, cfg_mode=True)
        ours = np.asarray(res.tokens)[: int(res.n_tokens)].tolist()
        assert ours == ref_toks[0].tolist()

    def test_turbo_inference_token_identical(self, ref_gpt2_inf):
        """Greedy free-running Turbo loop vs the reference's
        T3.inference_turbo (ref: t3.py:392-468): temp→top_k→top_p→rep chain,
        start-token-only penalty at step 0, single-BOS prefix. top_p=1.0 so
        the repetition penalty actually decides tokens (at top_p<1 the
        near-one-hot greedy distribution leaves a single candidate).
        Cap semantics: the reference samples ONE token from the prefill and
        then max_gen_len more, so ref(max_gen_len=K-1) pairs with
        ours(max_new_tokens=K); the reference also strips a trailing EOS."""
        m, ref_hp = ref_gpt2_inf
        from chatterbox_tpu.models.t3.config import (T3Config, BackboneConfig,
                                                     BACKBONES)
        from chatterbox_tpu.models.t3 import model as t3m
        from chatterbox_tpu.sampling.decode import t3_generate
        from chatterbox_tpu.ops.sampling import SamplerParams
        BACKBONES["GPT2_tiny_inf"] = BackboneConfig(
            family="gpt2", hidden_size=64, num_layers=2, num_heads=4,
            head_dim=16, intermediate_size=256, max_positions=256,
            vocab_size=96)
        hp = T3Config(text_tokens_dict_size=96,
                      backbone_name="GPT2_tiny_inf",
                      speech_tokens_dict_size=80, input_pos_emb=None,
                      speech_cond_prompt_len=8,
                      use_perceiver_resampler=False, emotion_adv=False,
                      start_text_token=2, start_speech_token=75,
                      stop_speech_token=76)
        sd = {k: v.detach().float().numpy() for k, v in m.state_dict().items()}
        params = W.convert_t3(sd, hp)
        cond_mod = load_ref_module("chatterbox.models.t3.modules.cond_enc")
        torch.manual_seed(9)
        spk = torch.randn(1, 256)
        prompt = torch.randint(0, 80, (1, 8))
        t3cond = cond_mod.T3Cond(speaker_emb=spk,
                                 cond_prompt_speech_tokens=prompt,
                                 emotion_adv=None)
        # turbo passes raw BPE ids, no SOT/EOT framing (ref: tts_turbo.py:295)
        ids = torch.randint(1, 96, (1, 11))
        K = 12
        with _GreedyTorch(), torch.inference_mode():
            ref_toks = m.inference_turbo(
                t3_cond=t3cond, text_tokens=ids, temperature=1e-4,
                top_k=1000, top_p=1.0, repetition_penalty=1.2,
                max_gen_len=K - 1)
        cond = t3m.T3CondArrays(jnp.asarray(spk.numpy()),
                                jnp.asarray(prompt.numpy()), None)
        framed = np.zeros((1, 32), np.int32)
        framed[0, : ids.shape[1]] = ids[0].numpy()
        sp = SamplerParams.make(temperature=1e-4, top_p=1.0, min_p=0.0,
                                repetition_penalty=1.2, cfg_weight=0.0)
        res = t3_generate(params, hp, cond, jnp.asarray(framed),
                          jnp.asarray(ids.shape[1]), sp, jax.random.key(0),
                          max_new_tokens=K, top_k=1000, cfg_mode=False)
        ours = np.asarray(res.tokens)[: int(res.n_tokens)].tolist()
        if ours and ours[-1] == hp.stop_speech_token:
            ours = ours[:-1]          # ref strips a trailing EOS (t3.py:465)
        assert ours == ref_toks[0].tolist()


class TestNativeCheckpoint:
    def test_roundtrip(self, tmp_path):
        from chatterbox_tpu.convert.native_ckpt import save_pytree, load_pytree
        from chatterbox_tpu.models.t3.config import T3Config
        from chatterbox_tpu.models.t3 import model as t3m
        hp = T3Config.tiny_test("gpt2")
        params = t3m.t3_init(jax.random.key(0), hp)
        save_pytree(params, tmp_path / "p.safetensors")
        loaded = load_pytree(tmp_path / "p.safetensors", params)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
