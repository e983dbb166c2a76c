"""Golden parity: JAX HiFT vocoder vs the reference torch HiFTGenerator.

The reference module is importable (torch+scipy only). Randomness is
sidestepped by passing a full-length `cache_source`, which the reference
uses to overwrite its generated source signal (ref: hifigan.py:471-473),
making decode deterministic on both sides.
"""
import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from chatterbox_tpu.models.s3gen import hift as H
from tests.ref_loader import load_ref_module


def t2j(t):
    return jnp.asarray(t.detach().numpy())


@pytest.fixture(scope="module")
def ref_hift():
    hifigan = load_ref_module("chatterbox.models.s3gen.hifigan")
    f0p = load_ref_module("chatterbox.models.s3gen.f0_predictor")
    torch.manual_seed(0)
    m = hifigan.HiFTGenerator(
        sampling_rate=24000,
        upsample_rates=[8, 5, 3],
        upsample_kernel_sizes=[16, 11, 7],
        source_resblock_kernel_sizes=[7, 7, 11],
        source_resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5], [1, 3, 5]],
        f0_predictor=f0p.ConvRNNF0Predictor(),
    ).eval()
    return m


def convert_hift(m) -> dict:
    def conv(c):
        return {"w": t2j(c.weight.permute(2, 1, 0)), "b": t2j(c.bias)}

    def convT(c):
        w = torch.flip(c.weight, dims=[2]).permute(2, 0, 1)
        return {"w": t2j(w), "b": t2j(c.bias)}

    def resblock(r):
        return {
            "convs1": [conv(c) for c in r.convs1],
            "convs2": [conv(c) for c in r.convs2],
            "alpha1": [t2j(a.alpha) for a in r.activations1],
            "alpha2": [t2j(a.alpha) for a in r.activations2],
        }

    f0 = m.f0_predictor
    f0_convs = [f0.condnet[i] for i in (0, 2, 4, 6, 8)]
    return {
        "f0_predictor": {
            "convs": [conv(c) for c in f0_convs],
            "classifier": {"w": t2j(f0.classifier.weight.T), "b": t2j(f0.classifier.bias)},
        },
        "m_source_linear": {"w": t2j(m.m_source.l_linear.weight.T),
                            "b": t2j(m.m_source.l_linear.bias)},
        "conv_pre": conv(m.conv_pre),
        "ups": [convT(u) for u in m.ups],
        "source_downs": [conv(c) for c in m.source_downs],
        "source_resblocks": [resblock(r) for r in m.source_resblocks],
        "resblocks": [resblock(r) for r in m.resblocks],
        "conv_post": conv(m.conv_post),
    }


class TestHiFTParity:
    def test_f0_predictor(self, ref_hift):
        params = convert_hift(ref_hift)
        torch.manual_seed(1)
        mel = torch.randn(1, 80, 20)
        with torch.no_grad():
            ref = ref_hift.f0_predictor(mel).numpy()
        ours = H.f0_predictor_apply(params["f0_predictor"], t2j(mel.transpose(1, 2)))
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4)

    def test_decode_with_fixed_source(self, ref_hift):
        params = convert_hift(ref_hift)
        T = 12
        torch.manual_seed(2)
        mel = torch.randn(1, 80, T) * 0.5
        src = torch.randn(1, 1, T * 480) * 0.05
        with torch.no_grad():
            ref_wav, ref_src = ref_hift.inference(speech_feat=mel, cache_source=src)
        ours = H.hift_decode(convert_hift(ref_hift), t2j(mel.transpose(1, 2)),
                             t2j(src.transpose(1, 2)))
        assert ours.shape == tuple(ref_wav.shape)
        np.testing.assert_allclose(np.asarray(ours), ref_wav.numpy(), atol=2e-3)

    def test_source_statistics(self, ref_hift):
        """SineGen can't be compared sample-exact (different RNG); check the
        deterministic part: voiced/unvoiced structure and amplitude."""
        params = convert_hift(ref_hift)
        f0 = jnp.concatenate([jnp.full((1, 5 * 480), 200.0),
                              jnp.zeros((1, 5 * 480))], axis=1)
        f0_mel = f0[:, ::480]
        s = H.hift_source(params, jax.random.key(0), f0_mel)
        s = np.asarray(s)[0, :, 0]
        voiced, unvoiced = s[: 5 * 480], s[5 * 480:]
        # voiced region carries a periodic component, unvoiced is small noise
        assert np.abs(voiced).max() > np.abs(unvoiced).max()
        assert np.abs(unvoiced).std() < 0.1
