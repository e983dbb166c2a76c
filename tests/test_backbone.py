"""T3 backbone parity vs HuggingFace transformers (tiny configs, CPU).

Validates that our llama-family and gpt2-family backbones reproduce
HF LlamaModel / GPT2Model hidden states — the same modules the reference
uses as T3 backbones (ref: models/t3/t3.py:55-63) — including the KV-cache
decode path.
"""
import numpy as np
import torch
import jax.numpy as jnp

from chatterbox_tpu.models.t3.config import BackboneConfig
from chatterbox_tpu.models.t3 import backbone as bb


def t2j(t):
    return jnp.asarray(t.detach().numpy())


def make_llama_pair():
    from transformers import LlamaConfig, LlamaModel
    torch.manual_seed(0)
    hf_cfg = LlamaConfig(
        vocab_size=32, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        head_dim=16, rms_norm_eps=1e-5, rope_theta=500000.0,
        rope_scaling=dict(factor=8.0, high_freq_factor=4.0, low_freq_factor=1.0,
                          original_max_position_embeddings=8192, rope_type="llama3"),
        attention_bias=False, mlp_bias=False, tie_word_embeddings=False,
        max_position_embeddings=1024,
    )
    hf = LlamaModel(hf_cfg).eval()
    cfg = BackboneConfig(family="llama", hidden_size=64, num_layers=2,
                         num_heads=4, head_dim=16, intermediate_size=128,
                         num_kv_heads=4)
    layers = []
    for i in range(2):
        L = hf.layers[i]
        layers.append({
            "input_ln": {"g": t2j(L.input_layernorm.weight)},
            "q": {"w": t2j(L.self_attn.q_proj.weight.T)},
            "k": {"w": t2j(L.self_attn.k_proj.weight.T)},
            "v": {"w": t2j(L.self_attn.v_proj.weight.T)},
            "o": {"w": t2j(L.self_attn.o_proj.weight.T)},
            "post_ln": {"g": t2j(L.post_attention_layernorm.weight)},
            "gate": {"w": t2j(L.mlp.gate_proj.weight.T)},
            "up": {"w": t2j(L.mlp.up_proj.weight.T)},
            "down": {"w": t2j(L.mlp.down_proj.weight.T)},
        })
    params = {"layers": layers, "norm": {"g": t2j(hf.norm.weight)}}
    return hf, cfg, params


def make_gpt2_pair():
    from transformers import GPT2Config, GPT2Model
    torch.manual_seed(1)
    hf_cfg = GPT2Config(vocab_size=32, n_embd=64, n_head=4, n_layer=2,
                        n_positions=128, attn_pdrop=0.0, embd_pdrop=0.0,
                        resid_pdrop=0.0)
    hf = GPT2Model(hf_cfg).eval()
    cfg = BackboneConfig(family="gpt2", hidden_size=64, num_layers=2,
                         num_heads=4, head_dim=16, intermediate_size=256,
                         max_positions=128, vocab_size=32)
    layers = []
    for i in range(2):
        L = hf.h[i]
        layers.append({
            "ln1": {"g": t2j(L.ln_1.weight), "b": t2j(L.ln_1.bias)},
            # GPT2 Conv1D stores weight (in, out) already
            "qkv": {"w": t2j(L.attn.c_attn.weight), "b": t2j(L.attn.c_attn.bias)},
            "attn_out": {"w": t2j(L.attn.c_proj.weight), "b": t2j(L.attn.c_proj.bias)},
            "ln2": {"g": t2j(L.ln_2.weight), "b": t2j(L.ln_2.bias)},
            "fc_in": {"w": t2j(L.mlp.c_fc.weight), "b": t2j(L.mlp.c_fc.bias)},
            "fc_out": {"w": t2j(L.mlp.c_proj.weight), "b": t2j(L.mlp.c_proj.bias)},
        })
    params = {"layers": layers,
              "wpe": {"w": t2j(hf.wpe.weight)},
              "ln_f": {"g": t2j(hf.ln_f.weight), "b": t2j(hf.ln_f.bias)}}
    return hf, cfg, params


def _run_prefill(cfg, params, embeds, t_max):
    B, T, _ = embeds.shape
    lens = jnp.full((B,), T, jnp.int32)
    cache = bb.KVCache.zeros(cfg, B, t_max, dtype=jnp.float32)
    mask = bb.prefill_mask(T, t_max, lens)
    positions = jnp.tile(jnp.arange(T)[None], (B, 1))
    start = jnp.zeros((B,), jnp.int32)
    return bb.backbone_apply(params, cfg, embeds, positions, cache, start, mask)


class TestLlamaParity:
    def test_prefill_hidden_states(self):
        hf, cfg, params = make_llama_pair()
        torch.manual_seed(2)
        x = torch.randn(2, 9, 64)
        with torch.no_grad():
            ref = hf(inputs_embeds=x).last_hidden_state.numpy()
        ours, _ = _run_prefill(cfg, params, t2j(x), t_max=16)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4)

    def test_decode_step_matches_full(self):
        """Prefill T tokens then decode 3 more one-at-a-time; compare with a
        single full forward over T+3."""
        hf, cfg, params = make_llama_pair()
        torch.manual_seed(3)
        x = torch.randn(1, 12, 64)
        with torch.no_grad():
            ref = hf(inputs_embeds=x).last_hidden_state.numpy()
        T0, t_max = 9, 16
        h, cache = _run_prefill(cfg, params, t2j(x[:, :T0]), t_max)
        np.testing.assert_allclose(np.asarray(h), ref[:, :T0], atol=2e-4)
        for step in range(3):
            cur = jnp.array([T0 + step], jnp.int32)
            mask = bb.decode_mask(t_max, cur)
            pos = cur[:, None]
            h1, cache = bb.backbone_apply(params, cfg, t2j(x[:, T0 + step: T0 + step + 1]),
                                          pos, cache, cur, mask)
            np.testing.assert_allclose(np.asarray(h1[:, 0]), ref[:, T0 + step], atol=3e-4)


class TestGPT2Parity:
    def test_prefill_hidden_states(self):
        hf, cfg, params = make_gpt2_pair()
        torch.manual_seed(4)
        x = torch.randn(2, 7, 64)
        with torch.no_grad():
            ref = hf(inputs_embeds=x).last_hidden_state.numpy()
        ours, _ = _run_prefill(cfg, params, t2j(x), t_max=16)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4)

    def test_decode_step_matches_full(self):
        hf, cfg, params = make_gpt2_pair()
        torch.manual_seed(5)
        x = torch.randn(1, 10, 64)
        with torch.no_grad():
            ref = hf(inputs_embeds=x).last_hidden_state.numpy()
        T0, t_max = 7, 16
        h, cache = _run_prefill(cfg, params, t2j(x[:, :T0]), t_max)
        np.testing.assert_allclose(np.asarray(h), ref[:, :T0], atol=2e-4)
        for step in range(3):
            cur = jnp.array([T0 + step], jnp.int32)
            mask = bb.decode_mask(t_max, cur)
            pos = cur[:, None]
            h1, cache = bb.backbone_apply(params, cfg, t2j(x[:, T0 + step: T0 + step + 1]),
                                          pos, cache, cur, mask)
            np.testing.assert_allclose(np.asarray(h1[:, 0]), ref[:, T0 + step], atol=3e-4)


class TestUnrolledParity:
    """The decode engines use backbone_apply_unrolled; verify it matches the
    reference-validated backbone_apply exactly (prefill + decode step)."""

    def _check(self, make_pair):
        hf, cfg, params = make_pair()
        torch.manual_seed(9)
        x = torch.randn(2, 7, 64)
        T0, t_max = 7, 16
        lens = jnp.full((2,), T0, jnp.int32)
        cache = bb.KVCache.zeros(cfg, 2, t_max, dtype=jnp.float32)
        mask = bb.prefill_mask(T0, t_max, lens)
        pos = jnp.tile(jnp.arange(T0)[None], (2, 1))
        start = jnp.zeros((2,), jnp.int32)
        h_ref, c_ref = bb.backbone_apply(params, cfg, t2j(x), pos, cache, start, mask)
        h_unr, c_unr = bb.backbone_apply_unrolled(params, cfg, t2j(x), pos,
                                                  bb.KVCache.zeros(cfg, 2, t_max, dtype=jnp.float32),
                                                  jnp.zeros((), jnp.int32), mask)
        np.testing.assert_allclose(np.asarray(h_unr), np.asarray(h_ref), atol=1e-5)
        np.testing.assert_allclose(np.asarray(c_unr.k), np.asarray(c_ref.k), atol=1e-5)
        # one decode step at a shared scalar position
        xt = torch.randn(2, 1, 64)
        cur_v = jnp.full((2,), T0, jnp.int32)
        m2 = bb.decode_mask(t_max, cur_v)
        h1, _ = bb.backbone_apply(params, cfg, t2j(xt), cur_v[:, None], c_ref,
                                  cur_v, m2)
        h2, _ = bb.backbone_apply_unrolled(params, cfg, t2j(xt), cur_v[:, None],
                                           c_unr, jnp.asarray(T0, jnp.int32), m2)
        np.testing.assert_allclose(np.asarray(h2), np.asarray(h1), atol=1e-5)

    def test_llama(self):
        self._check(make_llama_pair)

    def test_gpt2(self):
        self._check(make_gpt2_pair)
