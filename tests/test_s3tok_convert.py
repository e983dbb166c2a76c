"""S3TokenizerV2 conversion golden test against a torch replica.

The pip `s3tokenizer` package isn't installed in this image, so the oracle is
a minimal torch reimplementation of the S3TokenizerV2 encoder+FSQ (whisper
-style blocks + tanh-FSQ base-3 compose, per the public
xingchensong/S3Tokenizer model_v2 layout) serialized with the exact
`tokenizer.*` state-dict names the reference checkpoint uses
(ref: models/s3gen/s3gen.py:55,239 loads them from s3gen.safetensors).

This exercises `convert_s3tokenizer` end-to-end: names, layouts, and
token-exact numerical parity — plus the hard-error path on a missing key.
"""
import math

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from chatterbox_tpu.models.s3tok.model import (
    S3TokenizerConfig, s3tokenizer_encode_mel)
from chatterbox_tpu.convert.weights import (
    convert_s3tokenizer, S3TokenizerConversionError)


# ---------------- torch replica (oracle) ----------------

def t_sinusoids(length, channels):
    log_timescale = math.log(10000.0) / (channels // 2 - 1)
    inv = torch.exp(-log_timescale * torch.arange(channels // 2))
    t = torch.arange(length)[:, None].float() * inv[None, :]
    return torch.cat([torch.sin(t), torch.cos(t)], dim=1)


class TMHA(tnn.Module):
    def __init__(self, d, h):
        super().__init__()
        self.h = h
        self.query = tnn.Linear(d, d)
        self.key = tnn.Linear(d, d, bias=False)
        self.value = tnn.Linear(d, d)
        self.out = tnn.Linear(d, d)

    def forward(self, x):
        B, T, D = x.shape
        q = self.query(x).view(B, T, self.h, -1).transpose(1, 2)
        k = self.key(x).view(B, T, self.h, -1).transpose(1, 2)
        v = self.value(x).view(B, T, self.h, -1).transpose(1, 2)
        a = F.scaled_dot_product_attention(q, k, v)
        return self.out(a.transpose(1, 2).reshape(B, T, D))


class TBlock(tnn.Module):
    def __init__(self, d, h):
        super().__init__()
        self.attn = TMHA(d, h)
        self.attn_ln = tnn.LayerNorm(d)
        self.mlp = tnn.Sequential(tnn.Linear(d, 4 * d), tnn.GELU(),
                                  tnn.Linear(4 * d, d))
        self.mlp_ln = tnn.LayerNorm(d)

    def forward(self, x):
        x = x + self.attn(self.attn_ln(x))
        x = x + self.mlp(self.mlp_ln(x))
        return x


class TEncoder(tnn.Module):
    def __init__(self, n_mels, d, h, L):
        super().__init__()
        self.conv1 = tnn.Conv1d(n_mels, d, 3, stride=2, padding=1)
        self.conv2 = tnn.Conv1d(d, d, 3, stride=2, padding=1)
        self.blocks = tnn.ModuleList([TBlock(d, h) for _ in range(L)])
        self.ln_post = tnn.LayerNorm(d)

    def forward(self, mel):                       # (B, n_mels, T_mel)
        h = F.gelu(self.conv1(mel))
        h = F.gelu(self.conv2(h))
        h = h.transpose(1, 2)                     # (B, T, d)
        h = h + t_sinusoids(h.shape[1], h.shape[2])
        for b in self.blocks:
            h = b(h)
        return self.ln_post(h)


class TCodebook(tnn.Module):
    def __init__(self, d, fsq_dim=8):
        super().__init__()
        self.project_down = tnn.Linear(d, fsq_dim)


class TQuantizer(tnn.Module):
    def __init__(self, d):
        super().__init__()
        self._codebook = TCodebook(d)

    def encode(self, h):
        z = torch.tanh(self._codebook.project_down(h)) * 0.9990000128746033
        digits = torch.round(z) + 1.0
        powers = (3.0 ** torch.arange(z.shape[-1])).float()
        return (digits * powers).sum(-1).long()


class TS3TokenizerV2(tnn.Module):
    def __init__(self, n_mels, d, h, L):
        super().__init__()
        self.encoder = TEncoder(n_mels, d, h, L)
        self.quantizer = TQuantizer(d)

    def forward(self, mel):
        return self.quantizer.encode(self.encoder(mel))


def _state_dict_prefixed(model, prefix="tokenizer"):
    return {f"{prefix}.{k}": v.detach().numpy()
            for k, v in model.state_dict().items()}


@pytest.fixture(scope="module")
def replica():
    torch.manual_seed(0)
    cfg = S3TokenizerConfig(n_mels=128, n_state=64, n_heads=4, n_layers=2)
    model = TS3TokenizerV2(cfg.n_mels, cfg.n_state, cfg.n_heads, cfg.n_layers)
    model.eval()
    return cfg, model


class TestS3TokenizerConversion:
    def test_token_exact_parity(self, replica):
        cfg, model = replica
        sd = _state_dict_prefixed(model)
        params = convert_s3tokenizer(sd)

        rng = np.random.default_rng(0)
        T_mel = 48                                        # 12 tokens
        mel = rng.standard_normal((2, cfg.n_mels, T_mel)).astype(np.float32)
        with torch.no_grad():
            ref_tokens = model(torch.from_numpy(mel)).numpy()

        tokens, tok_len = s3tokenizer_encode_mel(
            jax.tree.map(jnp.asarray, params), cfg,
            jnp.asarray(mel.transpose(0, 2, 1)),
            jnp.full((2,), T_mel, jnp.int32))
        assert (np.asarray(tok_len) == T_mel // 4).all()
        np.testing.assert_array_equal(np.asarray(tokens), ref_tokens)
        # real tokens over the full 3^8 vocab
        assert (ref_tokens >= 0).all() and (ref_tokens < 6561).all()

    def test_missing_key_is_hard_error(self, replica):
        _, model = replica
        sd = _state_dict_prefixed(model)
        del sd["tokenizer.encoder.blocks.1.attn.query.weight"]
        with pytest.raises(S3TokenizerConversionError):
            convert_s3tokenizer(sd)

    def test_dry_map_full_coverage(self, replica):
        """On a matching layout the dry-map consumes every key and wants
        nothing (so a real-checkpoint diff is pure signal)."""
        from chatterbox_tpu.convert.weights import dry_map_s3tokenizer
        _, model = replica
        sd = _state_dict_prefixed(model)
        rep = dry_map_s3tokenizer(sd.keys())
        assert rep["unmapped"] == [] and rep["missing"] == []
        assert rep["n_layers"] == len(model.encoder.blocks)
        assert len(rep["mapped"]) == len(sd)

    def test_dry_map_reports_drift(self, replica):
        """Architecture drift shows up as an inventory diff, not a crash:
        an unknown checkpoint key → unmapped; a deleted one → missing;
        ignore-missing buffers (ref s3tokenizer.py:29) → neither."""
        from chatterbox_tpu.convert.weights import dry_map_s3tokenizer
        _, model = replica
        sd = _state_dict_prefixed(model)
        keys = set(sd) | {"tokenizer.encoder.blocks.0.attn.rel_pos.weight",
                          "tokenizer._mel_filters",
                          "tokenizer.encoder.window"}
        keys.discard("tokenizer.encoder.ln_post.bias")
        rep = dry_map_s3tokenizer(keys)
        assert rep["unmapped"] == [
            "tokenizer.encoder.blocks.0.attn.rel_pos.weight"]
        assert rep["missing"] == ["tokenizer.encoder.ln_post.bias"]

    def test_missing_fsq_is_hard_error(self, replica):
        _, model = replica
        sd = _state_dict_prefixed(model)
        sd = {k: v for k, v in sd.items() if "project_down" not in k}
        with pytest.raises(S3TokenizerConversionError):
            convert_s3tokenizer(sd)

    def test_alternate_fsq_spelling(self, replica):
        cfg, model = replica
        sd = _state_dict_prefixed(model)
        sd = {k.replace("quantizer._codebook.", "quantizer."): v
              for k, v in sd.items()}
        params = convert_s3tokenizer(sd)
        assert params["fsq_proj"]["w"].shape == (cfg.n_state, cfg.fsq_dim)

    def test_empty_state_dict_is_hard_error(self):
        with pytest.raises(S3TokenizerConversionError):
            convert_s3tokenizer({"flow.something.weight": np.zeros((1,))})
