"""Parity tests for NN primitives against torch CPU."""
import numpy as np
import torch
import jax
import jax.numpy as jnp

from chatterbox_tpu.nn import core as nn


def t2j(t):
    return jnp.asarray(t.detach().numpy())


class TestConv:
    def test_conv1d_matches_torch(self):
        torch.manual_seed(0)
        m = torch.nn.Conv1d(8, 16, 3, padding=1)
        x = torch.randn(2, 8, 50)
        ref = m(x).detach().numpy()
        p = {"w": t2j(m.weight.permute(2, 1, 0)), "b": t2j(m.bias)}
        ours = nn.conv1d(p, t2j(x.permute(0, 2, 1)), padding=1)
        np.testing.assert_allclose(np.asarray(ours.transpose(0, 2, 1)), ref, atol=1e-5)

    def test_conv1d_dilated_groups(self):
        torch.manual_seed(1)
        m = torch.nn.Conv1d(8, 8, 5, dilation=3, padding=6, groups=2)
        x = torch.randn(1, 8, 64)
        ref = m(x).detach().numpy()
        p = {"w": t2j(m.weight.permute(2, 1, 0)), "b": t2j(m.bias)}
        ours = nn.conv1d(p, t2j(x.permute(0, 2, 1)), padding=6, dilation=3, groups=2)
        np.testing.assert_allclose(np.asarray(ours.transpose(0, 2, 1)), ref, atol=1e-5)

    def test_conv_transpose1d_matches_torch(self):
        torch.manual_seed(2)
        # HiFT-style upsample: k=16, stride=8, padding=(k-u)//2=4
        m = torch.nn.ConvTranspose1d(12, 6, 16, 8, padding=4)
        x = torch.randn(2, 12, 20)
        ref = m(x).detach().numpy()
        # converter transform: (Cin, Cout, K) -> flip K -> (K, Cin, Cout)
        w = torch.flip(m.weight, dims=[2]).permute(2, 0, 1)
        p = {"w": t2j(w), "b": t2j(m.bias)}
        ours = nn.conv_transpose1d(p, t2j(x.permute(0, 2, 1)), stride=8, k=16, padding=4)
        np.testing.assert_allclose(np.asarray(ours.transpose(0, 2, 1)), ref, atol=1e-5)

    def test_conv2d_matches_torch(self):
        torch.manual_seed(3)
        m = torch.nn.Conv2d(1, 32, 3, stride=(2, 1), padding=1, bias=False)
        x = torch.randn(2, 1, 40, 30)
        ref = m(x).detach().numpy()
        p = {"w": t2j(m.weight.permute(2, 3, 1, 0))}
        ours = nn.conv2d(p, t2j(x.permute(0, 2, 3, 1)), stride=(2, 1), padding=(1, 1))
        np.testing.assert_allclose(np.asarray(ours.transpose(0, 3, 1, 2)), ref, atol=1e-5)


class TestNorms:
    def test_layer_norm(self):
        torch.manual_seed(4)
        m = torch.nn.LayerNorm(32)
        with torch.no_grad():
            m.weight.normal_(); m.bias.normal_()
        x = torch.randn(2, 7, 32)
        ref = m(x).detach().numpy()
        p = {"g": t2j(m.weight), "b": t2j(m.bias)}
        ours = nn.layer_norm(p, t2j(x))
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)

    def test_group_norm(self):
        torch.manual_seed(5)
        m = torch.nn.GroupNorm(8, 256)
        with torch.no_grad():
            m.weight.normal_(); m.bias.normal_()
        x = torch.randn(2, 256, 17)
        ref = m(x).detach().numpy()
        p = {"g": t2j(m.weight), "b": t2j(m.bias)}
        ours = nn.group_norm(p, t2j(x.permute(0, 2, 1)), groups=8)
        np.testing.assert_allclose(np.asarray(ours.transpose(0, 2, 1)), ref, atol=1e-4)

    def test_rms_norm_matches_llama(self):
        x = torch.randn(2, 5, 64)
        g = torch.randn(64)
        var = x.pow(2).mean(-1, keepdim=True)
        ref = (x * torch.rsqrt(var + 1e-5) * g).numpy()
        ours = nn.rms_norm({"g": t2j(g)}, t2j(x))
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)

    def test_batch_norm_inference(self):
        torch.manual_seed(6)
        m = torch.nn.BatchNorm1d(16).eval()
        with torch.no_grad():
            m.weight.normal_(); m.bias.normal_()
            m.running_mean.normal_(); m.running_var.uniform_(0.5, 2.0)
        x = torch.randn(2, 16, 9)
        ref = m(x).detach().numpy()
        p = {"g": t2j(m.weight), "b": t2j(m.bias),
             "mean": t2j(m.running_mean), "var": t2j(m.running_var)}
        ours = nn.batch_norm(p, t2j(x.permute(0, 2, 1)))
        np.testing.assert_allclose(np.asarray(ours.transpose(0, 2, 1)), ref, atol=1e-5)


class TestActivations:
    def test_gelu_new_matches_gpt2(self):
        torch.manual_seed(10)
        x = torch.randn(100)
        ref = torch.nn.functional.gelu(x, approximate="tanh").numpy()
        np.testing.assert_allclose(np.asarray(nn.gelu_new(t2j(x))), ref, atol=1e-4)

    def test_mish(self):
        torch.manual_seed(11)
        x = torch.randn(100)
        ref = torch.nn.functional.mish(x).numpy()
        np.testing.assert_allclose(np.asarray(nn.mish(t2j(x))), ref, atol=1e-4)

    def test_snake_matches_reference_formula(self):
        # ref: models/s3gen/hifigan.py:73-84
        torch.manual_seed(12)
        x = torch.randn(2, 33, 8)
        alpha = torch.rand(8) + 0.5
        ref = (x + (1.0 / (alpha + 1e-9)) * torch.sin(x * alpha) ** 2).numpy()
        np.testing.assert_allclose(np.asarray(nn.snake(t2j(x), t2j(alpha))), ref, atol=1e-5)

    def test_elu(self):
        torch.manual_seed(13)
        x = torch.randn(100)
        ref = torch.nn.functional.elu(x).numpy()
        np.testing.assert_allclose(np.asarray(nn.elu(t2j(x))), ref, atol=1e-4)


class TestLSTM:
    def test_matches_torch_3layer(self):
        torch.manual_seed(7)
        m = torch.nn.LSTM(40, 64, num_layers=3, batch_first=True)
        x = torch.randn(3, 25, 40)
        ref_out, (ref_h, ref_c) = m(x)
        layers = []
        for i in range(3):
            layers.append({
                "w_ih": t2j(getattr(m, f"weight_ih_l{i}").T),
                "w_hh": t2j(getattr(m, f"weight_hh_l{i}").T),
                "b_ih": t2j(getattr(m, f"bias_ih_l{i}")),
                "b_hh": t2j(getattr(m, f"bias_hh_l{i}")),
            })
        out, (h, c) = nn.lstm({"layers": layers}, t2j(x))
        np.testing.assert_allclose(np.asarray(out), ref_out.detach().numpy(), atol=5e-4)
        np.testing.assert_allclose(np.asarray(h), ref_h.detach().numpy(), atol=5e-4)
        np.testing.assert_allclose(np.asarray(c), ref_c.detach().numpy(), atol=5e-4)


class TestAttention:
    def test_mha_matches_sdpa(self):
        torch.manual_seed(8)
        q = torch.randn(2, 4, 10, 16)
        k = torch.randn(2, 4, 12, 16)
        v = torch.randn(2, 4, 12, 16)
        mask = torch.rand(2, 1, 10, 12) > 0.3
        ref = torch.nn.functional.scaled_dot_product_attention(
            q, k, v, attn_mask=mask).numpy()
        ours = nn.mha(t2j(q), t2j(k), t2j(v), mask=t2j(mask))
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)
