"""Golden parity: our JAX upsample conformer encoder vs the reference torch
module run with identical (randomly initialized) weights."""
import numpy as np
import pytest
import torch
import jax.numpy as jnp

from chatterbox_tpu.models.s3gen import encoder as enc
from tests.ref_loader import load_ref_module


def t2j(t):
    return jnp.asarray(t.detach().numpy())


@pytest.fixture(scope="module")
def ref_encoder():
    ue = load_ref_module("chatterbox.models.s3gen.transformer.upsample_encoder")
    torch.manual_seed(0)
    m = ue.UpsampleConformerEncoder(
        output_size=512, attention_heads=8, linear_units=2048, num_blocks=6,
        dropout_rate=0.0, positional_dropout_rate=0.0, attention_dropout_rate=0.0,
        normalize_before=True, input_layer='linear',
        pos_enc_layer_type='rel_pos_espnet', selfattention_layer_type='rel_selfattn',
        input_size=512, use_cnn_module=False, macaron_style=False,
    ).eval()
    return m


def convert_encoder_weights(m) -> dict:
    def lin(l):
        p = {"w": t2j(l.weight.T)}
        if l.bias is not None:
            p["b"] = t2j(l.bias)
        return p

    def ln(l):
        return {"g": t2j(l.weight), "b": t2j(l.bias)}

    def conv(c):
        return {"w": t2j(c.weight.permute(2, 1, 0)), "b": t2j(c.bias)}

    def block(L):
        a = L.self_attn
        return {
            "norm_mha": ln(L.norm_mha),
            "attn": {
                "q": lin(a.linear_q), "k": lin(a.linear_k), "v": lin(a.linear_v),
                "out": lin(a.linear_out), "pos": lin(a.linear_pos),
                "pos_bias_u": t2j(a.pos_bias_u), "pos_bias_v": t2j(a.pos_bias_v),
            },
            "norm_ff": ln(L.norm_ff),
            "ff_in": lin(L.feed_forward.w_1),
            "ff_out": lin(L.feed_forward.w_2),
        }

    return {
        "embed": {"linear": lin(m.embed.out[0]), "norm": ln(m.embed.out[1])},
        "pre_lookahead": {"conv1": conv(m.pre_lookahead_layer.conv1),
                          "conv2": conv(m.pre_lookahead_layer.conv2)},
        "blocks": [block(L) for L in m.encoders],
        "up_conv": conv(m.up_layer.conv),
        "up_embed": {"linear": lin(m.up_embed.out[0]), "norm": ln(m.up_embed.out[1])},
        "up_blocks": [block(L) for L in m.up_encoders],
        "after_norm": ln(m.after_norm),
    }


class TestUpsampleEncoderParity:
    def test_full_forward(self, ref_encoder):
        m = ref_encoder
        params = convert_encoder_weights(m)
        torch.manual_seed(1)
        x = torch.randn(1, 12, 512)
        lens = torch.tensor([12])
        with torch.no_grad():
            ref, ref_masks = m(x, lens)
        ours, out_lens = enc.upsample_encoder_apply(params, t2j(x), jnp.asarray([12]))
        assert ours.shape == tuple(ref.shape)
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=5e-4)
        assert int(out_lens[0]) == 24

    def test_padding_mask(self, ref_encoder):
        """Padded positions must not affect valid outputs."""
        m = ref_encoder
        params = convert_encoder_weights(m)
        torch.manual_seed(2)
        x = torch.randn(1, 10, 512)
        with torch.no_grad():
            ref, _ = m(x, torch.tensor([10]))
        xp = torch.cat([x, torch.randn(1, 4, 512)], dim=1)  # garbage padding
        ours, _ = enc.upsample_encoder_apply(params, t2j(xp), jnp.asarray([10]))
        np.testing.assert_allclose(np.asarray(ours[:, :20]), ref.numpy(), atol=5e-4)
