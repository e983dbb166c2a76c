"""CFM UNet parity vs a torch replica of the reference ConditionalDecoder.

diffusers isn't installed in this image, so the oracle is a minimal torch
reimplementation of the exact ops the reference uses (ref:
models/s3gen/decoder.py:99-333 + matcha/transformer.py:137-316 with
diffusers.Attention: no qkv bias, out bias, head scale; GELU-FF).
"""
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F
import jax.numpy as jnp

from chatterbox_tpu.models.s3gen import unet as U
from chatterbox_tpu.models.s3gen import cfm
import jax


def t2j(t):
    return jnp.asarray(t.detach().numpy())


# ---------------- torch replica (oracle) ----------------

class TCausalBlock(tnn.Module):
    def __init__(self, c_in, c_out):
        super().__init__()
        self.conv = tnn.Conv1d(c_in, c_out, 3)
        self.norm = tnn.LayerNorm(c_out)

    def forward(self, x, mask):  # x (B,C,T)
        h = F.pad(x * mask, (2, 0))
        h = self.conv(h)
        h = self.norm(h.transpose(1, 2)).transpose(1, 2)
        return F.mish(h) * mask


class TResnet(tnn.Module):
    def __init__(self, c_in, c_out, temb):
        super().__init__()
        self.mlp = tnn.Linear(temb, c_out)
        self.block1 = TCausalBlock(c_in, c_out)
        self.block2 = TCausalBlock(c_out, c_out)
        self.res_conv = tnn.Conv1d(c_in, c_out, 1)

    def forward(self, x, mask, temb):
        h = self.block1(x, mask)
        h = h + self.mlp(F.mish(temb)).unsqueeze(-1)
        h = self.block2(h, mask)
        return h + self.res_conv(x * mask)


class TTfmr(tnn.Module):
    def __init__(self, dim, heads, head_dim):
        super().__init__()
        inner = heads * head_dim
        self.heads = heads
        self.norm1 = tnn.LayerNorm(dim)
        self.to_q = tnn.Linear(dim, inner, bias=False)
        self.to_k = tnn.Linear(dim, inner, bias=False)
        self.to_v = tnn.Linear(dim, inner, bias=False)
        self.to_out = tnn.Linear(inner, dim)
        self.norm3 = tnn.LayerNorm(dim)
        self.ff_in = tnn.Linear(dim, dim * 4)
        self.ff_out = tnn.Linear(dim * 4, dim)

    def forward(self, x):  # (B,T,C), full mask
        h = self.norm1(x)
        B, T, _ = h.shape
        def sh(t):
            return t.view(B, T, self.heads, -1).transpose(1, 2)
        a = F.scaled_dot_product_attention(sh(self.to_q(h)), sh(self.to_k(h)), sh(self.to_v(h)))
        a = a.transpose(1, 2).reshape(B, T, -1)
        x = x + self.to_out(a)
        h = self.norm3(x)
        return x + self.ff_out(F.gelu(self.ff_in(h)))


class TUNet(tnn.Module):
    def __init__(self, in_ch=24, out_ch=6, ch=16, n_blocks=1, n_mid=2,
                 heads=2, head_dim=8, meanflow=False):
        super().__init__()
        temb = ch * 4
        self.in_ch = in_ch
        self.meanflow = meanflow
        self.t1 = tnn.Linear(in_ch, temb)
        self.t2 = tnn.Linear(temb, temb)
        if meanflow:
            self.mixer = tnn.Linear(2 * temb, temb, bias=False)
            with torch.no_grad():
                w = torch.zeros(temb, 2 * temb)
                w[:, :temb] = torch.eye(temb)
                self.mixer.weight.copy_(w)
        self.down_res = TResnet(in_ch, ch, temb)
        self.down_tf = tnn.ModuleList([TTfmr(ch, heads, head_dim) for _ in range(n_blocks)])
        self.down_conv = tnn.Conv1d(ch, ch, 3)
        self.mid = tnn.ModuleList()
        for _ in range(n_mid):
            self.mid.append(tnn.ModuleList(
                [TResnet(ch, ch, temb), tnn.ModuleList([TTfmr(ch, heads, head_dim) for _ in range(n_blocks)])]))
        self.up_res = TResnet(ch * 2, ch, temb)
        self.up_tf = tnn.ModuleList([TTfmr(ch, heads, head_dim) for _ in range(n_blocks)])
        self.up_conv = tnn.Conv1d(ch, ch, 3)
        self.final = TCausalBlock(ch, ch)
        self.proj = tnn.Conv1d(ch, out_ch, 1)

    def time_emb(self, t):
        half = self.in_ch // 2
        freqs = torch.exp(torch.arange(half, dtype=torch.float32) * -(np.log(10000.0) / (half - 1)))
        args = 1000.0 * t[:, None] * freqs[None]
        e = torch.cat([args.sin(), args.cos()], dim=-1)
        return self.t2(F.silu(self.t1(e)))

    def forward(self, x, mask, mu, t, spks, cond, r=None):
        temb = self.time_emb(t)
        if self.meanflow:
            temb = self.mixer(torch.cat([temb, self.time_emb(r)], dim=1))
        spks_t = spks.unsqueeze(-1).expand(-1, -1, x.shape[-1])
        h = torch.cat([x, mu, spks_t, cond], dim=1)
        h = self.down_res(h, mask, temb)
        h = h.transpose(1, 2)
        for b in self.down_tf:
            h = b(h)
        h = h.transpose(1, 2)
        skip = h
        h = self.down_conv(F.pad(h * mask, (2, 0)))
        for res, tfs in self.mid:
            h = res(h, mask, temb)
            h = h.transpose(1, 2)
            for b in tfs:
                h = b(h)
            h = h.transpose(1, 2)
        h = torch.cat([h, skip], dim=1)
        h = self.up_res(h, mask, temb)
        h = h.transpose(1, 2)
        for b in self.up_tf:
            h = b(h)
        h = h.transpose(1, 2)
        h = self.up_conv(F.pad(h * mask, (2, 0)))
        h = self.final(h, mask)
        return self.proj(h * mask) * mask


# ---------------- weight conversion ----------------

def conv_w(c):
    return {"w": t2j(c.weight.permute(2, 1, 0)), "b": t2j(c.bias)}


def lin_w(l):
    p = {"w": t2j(l.weight.T)}
    if l.bias is not None:
        p["b"] = t2j(l.bias)
    return p


def ln_w(l):
    return {"g": t2j(l.weight), "b": t2j(l.bias)}


def cb_w(b):
    return {"conv": conv_w(b.conv), "norm": ln_w(b.norm)}


def res_w(r):
    return {"mlp": lin_w(r.mlp), "block1": cb_w(r.block1), "block2": cb_w(r.block2),
            "res_conv": conv_w(r.res_conv)}


def tf_w(b):
    return {"norm1": ln_w(b.norm1), "to_q": lin_w(b.to_q), "to_k": lin_w(b.to_k),
            "to_v": lin_w(b.to_v), "to_out": lin_w(b.to_out), "norm3": ln_w(b.norm3),
            "ff_in": lin_w(b.ff_in), "ff_out": lin_w(b.ff_out)}


def convert(m: TUNet) -> dict:
    p = {
        "time_mlp": {"lin1": lin_w(m.t1), "lin2": lin_w(m.t2)},
        "down": [{"resnet": res_w(m.down_res), "tfmr": [tf_w(b) for b in m.down_tf],
                  "updown": conv_w(m.down_conv)}],
        "mid": [{"resnet": res_w(r), "tfmr": [tf_w(b) for b in tfs]} for r, tfs in m.mid],
        "up": [{"resnet": res_w(m.up_res), "tfmr": [tf_w(b) for b in m.up_tf],
                "updown": conv_w(m.up_conv)}],
        "final_block": cb_w(m.final),
        "final_proj": conv_w(m.proj),
    }
    if m.meanflow:
        p["time_mixer"] = lin_w(m.mixer)
    return p


class TestUNetParity:
    def _run(self, meanflow):
        torch.manual_seed(0)
        m = TUNet(meanflow=meanflow).eval()
        params = convert(m)
        B, T = 2, 8
        torch.manual_seed(1)
        x = torch.randn(B, 6, T)
        mu = torch.randn(B, 6, T)
        spks = torch.randn(B, 6)
        cond = torch.randn(B, 6, T)
        t = torch.tensor([0.3, 0.7])
        r = torch.tensor([0.5, 0.9])
        mask = torch.ones(B, 1, T)
        with torch.no_grad():
            ref = m(x, mask, mu, t, spks, cond, r=r if meanflow else None)
        ours = U.unet_apply(
            params, t2j(x.transpose(1, 2)), jnp.ones((B, T)), t2j(mu.transpose(1, 2)),
            t2j(t), t2j(spks), t2j(cond.transpose(1, 2)),
            r=t2j(r) if meanflow else None, n_heads=2, in_channels=24)
        np.testing.assert_allclose(np.asarray(ours.transpose(0, 2, 1)), ref.numpy(),
                                   atol=2e-4)

    def test_plain(self):
        self._run(meanflow=False)

    def test_meanflow(self):
        self._run(meanflow=True)


class TestCFM:
    def test_solver_shapes_and_determinism(self):
        torch.manual_seed(2)
        m = TUNet().eval()
        params = convert(m)
        B, T = 1, 8
        key = jax.random.key(0)
        mu = jnp.asarray(np.random.default_rng(0).standard_normal((B, T, 6), ).astype(np.float32))
        mask = jnp.ones((B, T))
        spks = jnp.zeros((B, 6))
        cond = jnp.zeros((B, T, 6))
        out1 = cfm.cfm_inference(params, mu, mask, spks, cond, key, n_timesteps=3, n_heads=2)
        out2 = cfm.cfm_inference(params, mu, mask, spks, cond, key, n_timesteps=3, n_heads=2)
        assert out1.shape == (B, T, 6)
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))

    def test_meanflow_two_step(self):
        torch.manual_seed(3)
        m = TUNet(meanflow=True).eval()
        params = convert(m)
        B, T = 1, 8
        mu = jnp.zeros((B, T, 6))
        out = cfm.cfm_inference(params, mu, jnp.ones((B, T)), jnp.zeros((B, 6)),
                                jnp.zeros((B, T, 6)), jax.random.key(1),
                                n_timesteps=2, meanflow=True, n_heads=2)
        assert out.shape == (B, T, 6)
        assert np.isfinite(np.asarray(out)).all()
