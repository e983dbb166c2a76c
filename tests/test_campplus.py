"""Golden parity: CAMPPlus x-vector vs the reference torch module.

The reference xvector.py imports torchaudio only for its fbank frontend
(which we implement separately and test in test_audio.py); stubbing that
import lets us load the module and validate the full network + the
convert_campplus name mapping.
"""
import sys
import types

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from chatterbox_tpu.convert import weights as W
from chatterbox_tpu.models.s3gen import campplus as C
from tests.ref_loader import load_ref_module


@pytest.fixture(scope="module")
def ref_campplus():
    if "torchaudio" not in sys.modules:
        ta = types.ModuleType("torchaudio")
        compliance = types.ModuleType("torchaudio.compliance")
        kaldi = types.ModuleType("torchaudio.compliance.kaldi")
        kaldi.fbank = None  # only used by extract_feature(), not by forward()
        ta.compliance = compliance
        compliance.kaldi = kaldi
        sys.modules["torchaudio"] = ta
        sys.modules["torchaudio.compliance"] = compliance
        sys.modules["torchaudio.compliance.kaldi"] = kaldi
    xv = load_ref_module("chatterbox.models.s3gen.xvector")
    torch.manual_seed(0)
    m = xv.CAMPPlus(memory_efficient=False).eval()
    return m


class TestCAMPPlusParity:
    def test_forward(self, ref_campplus):
        m = ref_campplus
        sd = {f"speaker_encoder.{k}": v.detach().float().numpy()
              for k, v in m.state_dict().items()}
        params = W.convert_campplus(sd)
        torch.manual_seed(1)
        feats = torch.randn(2, 180, 80)  # (B, T, 80) mean-normed fbank
        with torch.no_grad():
            ref = m(feats).numpy()
        ours = C.campplus_apply(params, jnp.asarray(feats.numpy()))
        assert ours.shape == ref.shape == (2, 192)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-3)

    def test_embed_wav_shapes(self, ref_campplus):
        m = ref_campplus
        sd = {f"speaker_encoder.{k}": v.detach().float().numpy()
              for k, v in m.state_dict().items()}
        params = W.convert_campplus(sd)
        rng = np.random.default_rng(2)
        wav = jnp.asarray((rng.standard_normal((1, 16000)) * 0.1).astype(np.float32))
        emb = C.campplus_embed_wav(params, wav)
        assert emb.shape == (1, 192)
        assert np.isfinite(np.asarray(emb)).all()

    def test_masked_pad_equals_unpadded(self, ref_campplus):
        """Pad-to-bucket + mask computes EXACTLY the unpadded x-vector: the
        embed_ref path that replaced the old 0.5 s truncation divergence."""
        m = ref_campplus
        sd = {f"speaker_encoder.{k}": v.detach().float().numpy()
              for k, v in m.state_dict().items()}
        params = W.convert_campplus(sd)
        rng = np.random.default_rng(7)
        # lengths chosen to hit odd frame counts, partial seg_pool segments
        # after the stride-2 TDNN, and a partial final fbank frame
        lens = [12345, 16000, 30777]
        bucket = 32000
        golden = [
            np.asarray(C.campplus_embed_wav(
                params, jnp.asarray((rng.standard_normal((1, n)) * 0.1
                                     ).astype(np.float32))))
            for n in lens]
        # rebuild the same wavs (fresh rng) into one padded batch
        rng = np.random.default_rng(7)
        batch = np.zeros((len(lens), bucket), np.float32)
        for i, n in enumerate(lens):
            batch[i, :n] = (rng.standard_normal((1, n)) * 0.1).astype(np.float32)
        embs = np.asarray(C.campplus_embed_wav(
            params, jnp.asarray(batch), jnp.asarray(lens, np.int32)))
        for i, g in enumerate(golden):
            np.testing.assert_allclose(embs[i : i + 1], g, atol=2e-4,
                                       err_msg=f"row {i} (len {lens[i]})")


# ---------------------------------------------------------------------------
# VoiceEncoder full-module golden (librosa stubbed — only needed for its
# wav-loading path, not the mel path we exercise)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ref_voice_encoder():
    if "librosa" not in sys.modules:
        lib = types.ModuleType("librosa")
        lib.resample = None
        lib.effects = types.SimpleNamespace(trim=None)
        lib.filters = types.SimpleNamespace(mel=None)
        lib.stft = None
        sys.modules["librosa"] = lib
    ve_mod = load_ref_module("chatterbox.models.voice_encoder.voice_encoder")
    torch.manual_seed(3)
    m = ve_mod.VoiceEncoder().eval()
    return m


class TestVoiceEncoderParity:
    def test_embeds_from_mels(self, ref_voice_encoder):
        m = ref_voice_encoder
        sd = {k: v.detach().float().numpy() for k, v in m.state_dict().items()}
        params = W.convert_voice_encoder(sd)
        from chatterbox_tpu.models.ve import model as ve
        rng = np.random.default_rng(4)
        # two utterances of different lengths (in mel frames, 40 mels)
        mels = [rng.random((300, 40)).astype(np.float32),
                rng.random((190, 40)).astype(np.float32)]
        ref = m.embeds_from_mels([t.copy() for t in mels], rate=1.3)
        ours = ve.embeds_from_mels(params, mels, rate=1.3)
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=2e-4)
