"""Swin-V2 torchvision-checkpoint importer parity (SURVEY §7 hard part (d)).

torchvision is not in this image, so the torch side is a hand-built twin
replicating torchvision's swin_v2 semantics at a tiny config: post-norm blocks,
cosine attention with clamped log temperature, continuous relative position bias
(log-spaced table -> 2-layer MLP -> 16*sigmoid), cyclic-shift window masks,
PatchMergingV2 cat order [x(0::2,0::2), x(1::2,0::2), x(0::2,1::2), x(1::2,1::2)].
The reference's style encoder is torchvision swin_v2_t with random init
(reference networks/s_zss_dm.py:19-20), so this importer serves trained-reference
checkpoints and torchvision weights."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402
from torch import nn  # noqa: E402

from stedm_tpu.models.swin import SwinV2  # noqa: E402
from stedm_tpu.utils.torch_import import map_swin_v2  # noqa: E402

EMBED, DEPTHS, HEADS, WINDOW = 8, (2, 2), (1, 2), 2


def _rel_index(win):
    coords = torch.stack(torch.meshgrid(torch.arange(win), torch.arange(win),
                                        indexing="ij")).flatten(1)
    rel = (coords[:, :, None] - coords[:, None, :]).permute(1, 2, 0) + (win - 1)
    return rel[..., 0] * (2 * win - 1) + rel[..., 1]


class TWinAttn(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.qkv = nn.Linear(dim, 3 * dim)
        self.proj = nn.Linear(dim, dim)
        self.logit_scale = nn.Parameter(torch.log(10 * torch.ones(heads, 1, 1)))
        self.cpb_mlp = nn.Sequential(nn.Linear(2, 512), nn.ReLU(inplace=True),
                                     nn.Linear(512, heads, bias=False))

    def _bias(self, win):
        coords = torch.arange(-(win - 1), win, dtype=torch.float32)
        table = torch.stack(torch.meshgrid(coords, coords, indexing="ij"), -1)
        table = table / (win - 1) * 8
        table = torch.sign(table) * torch.log2(table.abs() + 1) / math.log2(8)
        bt = self.cpb_mlp(table.reshape(-1, 2))
        idx = _rel_index(win).reshape(-1)
        t = win * win
        bias = bt[idx].reshape(t, t, self.heads).permute(2, 0, 1)
        return 16 * torch.sigmoid(bias)

    def forward(self, xw, win, mask=None):
        bt, t, c = xw.shape
        dh = c // self.heads
        qkv = self.qkv(xw).reshape(bt, t, 3, self.heads, dh).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = F.normalize(q, dim=-1) @ F.normalize(k, dim=-1).transpose(-2, -1)
        attn = attn * torch.clamp(self.logit_scale,
                                  max=math.log(100.0)).exp()
        attn = attn + self._bias(win)[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.view(bt // nw, nw, self.heads, t, t) + mask[None, :, None]
            attn = attn.view(bt, self.heads, t, t)
        out = (attn.softmax(-1) @ v).transpose(1, 2).reshape(bt, t, c)
        return self.proj(out)


class TBlock(nn.Module):
    def __init__(self, dim, heads, window, shift):
        super().__init__()
        self.window, self.shift = window, shift
        self.norm1 = nn.LayerNorm(dim)
        self.attn = TWinAttn(dim, heads)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = nn.Sequential(nn.Linear(dim, 4 * dim), nn.GELU(),
                                 nn.Identity(), nn.Linear(4 * dim, dim))

    def forward(self, x):  # x [B, H, W, C]
        b, h, w, c = x.shape
        win = min(self.window, h, w)
        shift = self.shift if (h > win or w > win) and self.shift < win else 0
        shortcut = x
        mask = None
        if shift:
            x = torch.roll(x, (-shift, -shift), (1, 2))
            img = torch.zeros(1, h, w, 1)
            cnt = 0
            for hs in (slice(0, -win), slice(-win, -shift), slice(-shift, None)):
                for ws in (slice(0, -win), slice(-win, -shift), slice(-shift, None)):
                    img[:, hs, ws, :] = cnt
                    cnt += 1
            mw = img.view(1, h // win, win, w // win, win, 1).permute(
                0, 1, 3, 2, 4, 5).reshape(-1, win * win)
            diff = mw[:, None, :] - mw[:, :, None]
            mask = torch.where(diff != 0, torch.tensor(-100.0), torch.tensor(0.0))
        xw = x.view(b, h // win, win, w // win, win, c).permute(
            0, 1, 3, 2, 4, 5).reshape(-1, win * win, c)
        aw = self.attn(xw, win, mask)
        x = aw.view(b, h // win, w // win, win, win, c).permute(
            0, 1, 3, 2, 4, 5).reshape(b, h, w, c)
        if shift:
            x = torch.roll(x, (shift, shift), (1, 2))
        x = shortcut + self.norm1(x)
        return x + self.norm2(self.mlp(x))


class TMerge(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.reduction = nn.Linear(4 * dim, 2 * dim, bias=False)
        self.norm = nn.LayerNorm(2 * dim)

    def forward(self, x):
        x0 = x[:, 0::2, 0::2, :]
        x1 = x[:, 1::2, 0::2, :]
        x2 = x[:, 0::2, 1::2, :]
        x3 = x[:, 1::2, 1::2, :]
        return self.norm(self.reduction(torch.cat([x0, x1, x2, x3], -1)))


class TSwin(nn.Module):
    """torchvision swin_v2 layout at the tiny test config (features.0/1/2/3)."""

    def __init__(self):
        super().__init__()
        embed = nn.Sequential(nn.Conv2d(3, EMBED, 4, 4), nn.Identity(),
                              nn.LayerNorm(EMBED))
        stages = []
        dim = EMBED
        for s, (depth, heads) in enumerate(zip(DEPTHS, HEADS)):
            stages.append(nn.Sequential(*[
                TBlock(dim, heads, WINDOW, 0 if i % 2 == 0 else WINDOW // 2)
                for i in range(depth)]))
            if s != len(DEPTHS) - 1:
                stages.append(TMerge(dim))
                dim *= 2
        self.features = nn.Sequential(embed, *stages)
        self.norm = nn.LayerNorm(dim)
        self.head = nn.Linear(dim, 512)

    def forward(self, x):  # [B, 3, H, W]
        x = self.features[0][0](x).permute(0, 2, 3, 1)
        x = self.features[0][2](x)
        for mod in self.features[1:]:
            x = mod(x)
        x = self.norm(x)
        return self.head(x.mean(dim=(1, 2)))


def test_swin_importer_forward_parity():
    torch.manual_seed(0)
    tm = TSwin().eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    loaded = map_swin_v2(sd)

    model = SwinV2(patch_size=4, embed_dim=EMBED, depths=DEPTHS, num_heads=HEADS,
                   window=WINDOW, num_classes=512)
    x = np.random.default_rng(0).normal(size=(2, 32, 32, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]

    flat = lambda tree: {"/".join(str(getattr(k, "key", k)) for k in p): v
                         for p, v in jax.tree_util.tree_flatten_with_path(tree)[0]}
    fp, fl = flat(params), flat(loaded)
    assert set(fp) == set(fl), set(fp) ^ set(fl)
    for k in fp:
        assert fp[k].shape == fl[k].shape, k

    out_j = np.asarray(model.apply({"params": loaded}, jnp.asarray(x)))
    with torch.no_grad():
        out_t = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    np.testing.assert_allclose(out_j, out_t, rtol=5e-4, atol=5e-4)


def test_remat_attn_is_value_and_grad_identical():
    """remat_attn (VERDICT r4 task 2a) is a pure memory optimization: the
    checkpointed attention core must produce identical outputs AND identical
    parameter gradients — it only changes what the backward pass stores."""
    model_r = SwinV2(patch_size=4, embed_dim=16, depths=(1, 1), num_heads=(2, 4),
                     window=4, num_classes=8, remat_attn=True)
    model_s = model_r.clone(remat_attn=False)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(2, 16, 16, 3)),
                    jnp.float32)
    params = model_r.init(jax.random.PRNGKey(1), x)["params"]

    out_r = model_r.apply({"params": params}, x)
    out_s = model_s.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(out_s),
                               rtol=1e-6, atol=1e-7)

    def loss(m):
        return lambda p: jnp.sum(m.apply({"params": p}, x) ** 2)

    g_r = jax.grad(loss(model_r))(params)
    g_s = jax.grad(loss(model_s))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_r),
                    jax.tree_util.tree_leaves(g_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
