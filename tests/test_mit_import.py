"""MiT (SegFormer Mix-Transformer) torch-checkpoint importer parity.

torchvision/timm/smp are not in this image, so the torch side is a hand-built
module replicating the PUBLISHED MiT layout exactly (NVlabs mix_transformer.py:
OverlapPatchEmbed -> blocks[norm1/attn(q,kv,sr,norm,proj)/norm2/mlp(fc1,dwconv,
fc2)] -> norm{t}; eps 1e-6 LayerNorms, exact GELU, fused kv projection). The
reference consumes these weights via smp.Unet(encoder_name="mit_b2",
encoder_weights="imagenet") (reference modules/segmentation.py:41).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402

from stedm_tpu.models.segformer import MiTEncoder  # noqa: E402
from stedm_tpu.utils.torch_import import map_mit_b2  # noqa: E402

DIMS, DEPTHS, HEADS, SRS = (16, 32, 64, 128), (2, 2, 2, 2), (1, 2, 4, 8), (8, 4, 2, 1)


class TAttn(nn.Module):
    def __init__(self, dim, heads, sr):
        super().__init__()
        self.heads, self.sr_ratio = heads, sr
        self.q = nn.Linear(dim, dim)
        self.kv = nn.Linear(dim, dim * 2)
        self.proj = nn.Linear(dim, dim)
        if sr > 1:
            self.sr = nn.Conv2d(dim, dim, sr, sr)
            self.norm = nn.LayerNorm(dim, eps=1e-6)

    def forward(self, x, H, W):
        B, N, C = x.shape
        dh = C // self.heads
        q = self.q(x).reshape(B, N, self.heads, dh).permute(0, 2, 1, 3)
        if self.sr_ratio > 1:
            x_ = x.permute(0, 2, 1).reshape(B, C, H, W)
            x_ = self.sr(x_).reshape(B, C, -1).permute(0, 2, 1)
            x_ = self.norm(x_)
        else:
            x_ = x
        kv = self.kv(x_).reshape(B, -1, 2, self.heads, dh).permute(2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]
        attn = (q @ k.transpose(-2, -1)) * (dh ** -0.5)
        out = (attn.softmax(-1) @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(out)


class TDWConv(nn.Module):
    def __init__(self, hidden):
        super().__init__()
        self.dwconv = nn.Conv2d(hidden, hidden, 3, 1, 1, groups=hidden)

    def forward(self, x, H, W):
        B, N, C = x.shape
        x = x.transpose(1, 2).view(B, C, H, W)
        return self.dwconv(x).flatten(2).transpose(1, 2)


class TMlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.dwconv = TDWConv(hidden)
        self.act = nn.GELU()
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x, H, W):
        return self.fc2(self.act(self.dwconv(self.fc1(x), H, W)))


class TBlock(nn.Module):
    def __init__(self, dim, heads, sr):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = TAttn(dim, heads, sr)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = TMlp(dim, dim * 4)

    def forward(self, x, H, W):
        x = x + self.attn(self.norm1(x), H, W)
        return x + self.mlp(self.norm2(x), H, W)


class TMiT(nn.Module):
    """Published mix_transformer layout (key names match the NVlabs weights)."""

    def __init__(self):
        super().__init__()
        for s in range(4):
            t = s + 1
            in_ch = 3 if s == 0 else DIMS[s - 1]
            k, stride, pad = (7, 4, 3) if s == 0 else (3, 2, 1)
            proj = nn.Conv2d(in_ch, DIMS[s], k, stride, pad)
            embed = nn.Module()
            embed.proj = proj
            embed.norm = nn.LayerNorm(DIMS[s], eps=1e-6)
            setattr(self, f"patch_embed{t}", embed)
            setattr(self, f"block{t}", nn.ModuleList(
                [TBlock(DIMS[s], HEADS[s], SRS[s]) for _ in range(DEPTHS[s])]))
            setattr(self, f"norm{t}", nn.LayerNorm(DIMS[s], eps=1e-6))

    def forward(self, x):
        feats = []
        for s in range(4):
            t = s + 1
            embed = getattr(self, f"patch_embed{t}")
            x = embed.proj(x)
            B, C, H, W = x.shape
            x = embed.norm(x.flatten(2).transpose(1, 2))
            for blk in getattr(self, f"block{t}"):
                x = blk(x, H, W)
            x = getattr(self, f"norm{t}")(x)
            x = x.reshape(B, H, W, C).permute(0, 3, 1, 2).contiguous()
            feats.append(x)
        return feats


def test_mit_importer_forward_parity():
    torch.manual_seed(0)
    tm = TMiT().eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    enc = MiTEncoder(embed_dims=DIMS, depths=DEPTHS, num_heads=HEADS, sr_ratios=SRS)
    x = np.random.default_rng(0).normal(size=(2, 64, 64, 3)).astype(np.float32)
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]

    loaded = map_mit_b2(sd)
    # every initialized tensor must be covered by the mapping, shapes matching
    flat_p = {"/".join(str(getattr(k, "key", k)) for k in p): v
              for p, v in jax.tree_util.tree_flatten_with_path(params)[0]}
    flat_l = {"/".join(str(getattr(k, "key", k)) for k in p): v
              for p, v in jax.tree_util.tree_flatten_with_path(loaded)[0]}
    assert set(flat_p) == set(flat_l), (
        set(flat_p) ^ set(flat_l))
    for k in flat_p:
        assert flat_p[k].shape == flat_l[k].shape, k

    feats_j = enc.apply({"params": loaded}, jnp.asarray(x))
    with torch.no_grad():
        feats_t = tm(torch.from_numpy(x).permute(0, 3, 1, 2))
    for s, (fj, ft) in enumerate(zip(feats_j, feats_t)):
        ft = ft.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(fj), ft, rtol=2e-4, atol=2e-4,
                                   err_msg=f"stage {s}")


def test_load_seg_encoder_roots(tmp_path):
    """Root auto-detection: bare NVlabs file and Lightning `_model.encoder.`."""
    from stedm_tpu.utils.torch_import import load_seg_encoder

    torch.manual_seed(1)
    tm = TMiT()
    for root in ("", "_model.encoder."):
        sd = {root + k: v for k, v in tm.state_dict().items()}
        path = tmp_path / f"mit_{root.count('.')}.pth"
        torch.save(sd, path)

        enc = MiTEncoder(embed_dims=DIMS, depths=DEPTHS, num_heads=HEADS,
                         sr_ratios=SRS)
        params = {"encoder": enc.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]}
        merged = load_seg_encoder(params, str(path))
        got = np.asarray(merged["encoder"]["patch_embed_0"]["bias"])
        want = tm.state_dict()["patch_embed1.proj.bias"].numpy()
        np.testing.assert_allclose(got, want)
