"""VAE perceptual + adversarial loss stack (SURVEY §2.4 "VAE losses", reference
ldm/modules/losses/{vqperceptual,contperceptual}.py + the taming modules they
import).

Parity strategy mirrors the other importer tests: hand-built torch twins with
random weights, state_dicts exported in the taming key layout, mapped through
`stedm_tpu.utils.torch_import.map_lpips` / `map_discriminator`, outputs diffed.
The adaptive discriminator weight (grad-norm ratio) is checked against torch
autograd on the same tiny generator.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402
from torch import nn  # noqa: E402

from stedm_tpu.models.discriminator import NLayerDiscriminator  # noqa: E402
from stedm_tpu.models.lpips import CHNS, LPIPS  # noqa: E402
from stedm_tpu.train import vae_losses as VL  # noqa: E402
from stedm_tpu.utils.torch_import import (  # noqa: E402
    map_discriminator,
    map_lpips,
    merge_loaded,
)


# --- torch twins (taming layouts) ---

_VGG_CFG = [  # (features idx, in, out) per conv, torchvision VGG16
    (0, 3, 64), (2, 64, 64), (5, 64, 128), (7, 128, 128),
    (10, 128, 256), (12, 256, 256), (14, 256, 256),
    (17, 256, 512), (19, 512, 512), (21, 512, 512),
    (24, 512, 512), (26, 512, 512), (28, 512, 512),
]
_SLICE_END = {1: 4, 2: 9, 3: 16, 4: 23, 5: 30}


class TorchLPIPS(nn.Module):
    """taming/modules/losses/lpips.py with random weights."""

    def __init__(self):
        super().__init__()
        self.register_buffer(
            "shift", torch.tensor([-0.030, -0.088, -0.188])[None, :, None, None])
        self.register_buffer(
            "scale", torch.tensor([0.458, 0.448, 0.450])[None, :, None, None])
        self.convs = nn.ModuleDict({
            str(i): nn.Conv2d(cin, cout, 3, padding=1)
            for i, cin, cout in _VGG_CFG})
        self.lins = nn.ModuleList(
            [nn.Conv2d(ch, 1, 1, bias=False) for ch in CHNS])

    def features(self, x):
        outs, idx = [], 0
        for s in range(1, 6):
            if s > 1:
                x = F.max_pool2d(x, 2, 2)
            while idx < len(_VGG_CFG) and _VGG_CFG[idx][0] < _SLICE_END[s]:
                x = F.relu(self.convs[str(_VGG_CFG[idx][0])](x))
                idx += 1
            outs.append(x)
        return outs

    @staticmethod
    def _norm(t):
        return t / (torch.sqrt(torch.sum(t ** 2, dim=1, keepdim=True)) + 1e-10)

    def forward(self, x, y):
        fx = self.features((x - self.shift) / self.scale)
        fy = self.features((y - self.shift) / self.scale)
        val = 0.0
        for k, (a, b) in enumerate(zip(fx, fy)):
            d = (self._norm(a) - self._norm(b)) ** 2
            val = val + self.lins[k](d).mean(dim=(2, 3), keepdim=True)
        return val

    def taming_state_dict(self):
        sd = {}
        for i, _, _ in _VGG_CFG:
            s = next(k for k, end in _SLICE_END.items() if i < end)
            conv = self.convs[str(i)]
            sd[f"net.slice{s}.{i}.weight"] = conv.weight.detach().numpy()
            sd[f"net.slice{s}.{i}.bias"] = conv.bias.detach().numpy()
        for k, lin in enumerate(self.lins):
            sd[f"lin{k}.model.1.weight"] = lin.weight.detach().numpy()
        return sd


def build_torch_patchgan(input_nc=3, ndf=64, n_layers=3):
    """taming NLayerDiscriminator (pix2pix PatchGAN) + weights_init."""
    seq = [nn.Conv2d(input_nc, ndf, 4, 2, 1), nn.LeakyReLU(0.2, True)]
    mult = 1
    for n in range(1, n_layers + 1):
        prev, mult = mult, min(2 ** n, 8)
        stride = 2 if n < n_layers else 1
        seq += [nn.Conv2d(ndf * prev, ndf * mult, 4, stride, 1, bias=False),
                nn.BatchNorm2d(ndf * mult), nn.LeakyReLU(0.2, True)]
    seq += [nn.Conv2d(ndf * mult, 1, 4, 1, 1)]
    model = nn.Sequential(*seq)
    torch.manual_seed(3)
    for m in model.modules():
        if isinstance(m, nn.Conv2d):
            nn.init.normal_(m.weight, 0.0, 0.02)
        elif isinstance(m, nn.BatchNorm2d):
            nn.init.normal_(m.weight, 1.0, 0.02)
            nn.init.constant_(m.bias, 0)
    return model


def test_lpips_matches_torch_twin():
    torch.manual_seed(0)
    twin = TorchLPIPS().eval()
    lpips = LPIPS()
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    y = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)

    params = lpips.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(y))
    params = merge_loaded(params["params"], map_lpips(twin.taming_state_dict()))

    ours = np.asarray(lpips.apply({"params": params}, jnp.asarray(x),
                                  jnp.asarray(y)))
    with torch.no_grad():
        theirs = twin(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
                      torch.from_numpy(np.transpose(y, (0, 3, 1, 2))))
    np.testing.assert_allclose(ours.reshape(-1),
                               theirs.numpy().reshape(-1), rtol=2e-4, atol=2e-5)
    # identical inputs -> zero distance
    zero = np.asarray(lpips.apply({"params": params}, jnp.asarray(x),
                                  jnp.asarray(x)))
    np.testing.assert_allclose(zero, 0.0, atol=1e-6)


def test_vgg_backbone_import_layout():
    """A bare torchvision-style ``features.{i}.*`` state_dict lands on the same
    slice names (the two-source import: imagenet VGG + taming lin heads)."""
    torch.manual_seed(0)
    twin = TorchLPIPS()
    sd_tv = {}
    for i, _, _ in _VGG_CFG:
        conv = twin.convs[str(i)]
        sd_tv[f"features.{i}.weight"] = conv.weight.detach().numpy()
        sd_tv[f"features.{i}.bias"] = conv.bias.detach().numpy()
    a = map_lpips(sd_tv)
    b = map_lpips(twin.taming_state_dict())
    for s, convs in ((1, (0, 2)), (3, (10, 12, 14)), (5, (24, 26, 28))):
        for i in convs:
            np.testing.assert_array_equal(a["net"][f"net_slice{s}_{i}"]["kernel"],
                                          b["net"][f"net_slice{s}_{i}"]["kernel"])


def test_discriminator_matches_torch_twin():
    twin = build_torch_patchgan(ndf=16)
    sd = {f"main.{k}": v.detach().numpy()
          for k, v in twin.state_dict().items()
          if "num_batches" not in k}
    p, stats = map_discriminator(sd)

    disc = NLayerDiscriminator(ndf=16)
    rng = np.random.default_rng(2)
    x = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    variables = disc.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = merge_loaded(variables["params"], p)
    bstats = merge_loaded(variables["batch_stats"], stats)

    # eval mode (running stats) — deterministic comparison
    ours = np.asarray(disc.apply({"params": params, "batch_stats": bstats},
                                 jnp.asarray(x), train=False))
    twin.eval()
    with torch.no_grad():
        theirs = twin(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    np.testing.assert_allclose(ours[..., 0], theirs[:, 0], rtol=2e-4, atol=2e-5)
    # patch-logit geometry: 32 -> 16 -> 8 -> 4 -> 3 -> 2 per pix2pix arithmetic
    assert ours.shape == (2, 2, 2, 1)


def test_gan_loss_goldens():
    rng = np.random.default_rng(0)
    lr = rng.normal(size=(4, 6, 6, 1)).astype(np.float32)
    lf = rng.normal(size=(4, 6, 6, 1)).astype(np.float32)
    tlr, tlf = torch.from_numpy(lr), torch.from_numpy(lf)
    hinge_t = 0.5 * (torch.mean(F.relu(1.0 - tlr)) + torch.mean(F.relu(1.0 + tlf)))
    van_t = 0.5 * (torch.mean(F.softplus(-tlr)) + torch.mean(F.softplus(tlf)))
    np.testing.assert_allclose(float(VL.hinge_d_loss(jnp.asarray(lr),
                                                     jnp.asarray(lf))),
                               float(hinge_t), rtol=1e-6)
    np.testing.assert_allclose(float(VL.vanilla_d_loss(jnp.asarray(lr),
                                                       jnp.asarray(lf))),
                               float(van_t), rtol=1e-6)
    assert float(VL.adopt_weight(1.0, jnp.int32(5), threshold=10)) == 0.0
    assert float(VL.adopt_weight(1.0, jnp.int32(10), threshold=10)) == 1.0

    idx = jnp.asarray(rng.integers(0, 7, size=(64,)))
    perp, used = VL.measure_perplexity(idx, 16)
    enc = F.one_hot(torch.from_numpy(np.asarray(idx)).long(), 16).float()
    avg = enc.mean(0)
    perp_t = (-(avg * torch.log(avg + 1e-10)).sum()).exp()
    np.testing.assert_allclose(float(perp), float(perp_t), rtol=1e-5)
    assert int(used) == int((avg > 0).sum())


def test_adaptive_weight_matches_torch_autograd():
    """d_weight = |∇_last nll| / (|∇_last g| + 1e-4) — our shared-forward vjp
    against torch's two autograd.grad calls (vqperceptual.py:85-96) on an
    identical one-conv generator + one-conv critic."""
    rng = np.random.default_rng(4)
    w = rng.normal(size=(3, 3, 2, 3), scale=0.3).astype(np.float32)  # HWIO
    wd = rng.normal(size=(4, 4, 3, 1), scale=0.3).astype(np.float32)
    z = rng.normal(size=(2, 8, 8, 2)).astype(np.float32)
    target = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)

    cfg = VL.VAELossConfig(disc_weight=0.8, perceptual_weight=0.0)

    def forward(params):
        rec = jax.lax.conv_general_dilated(
            z, params["decoder"]["conv_out"]["kernel"], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return rec, jnp.float32(0.0), jnp.zeros((2, 8, 8), jnp.int32)

    def disc_apply(rec):
        return jax.lax.conv_general_dilated(
            rec, jnp.asarray(wd), (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    loss_fn = VL.vq_generator_loss(
        cfg, forward=forward, disc_apply=disc_apply, lpips_apply=None,
        last_layer_path=("decoder", "conv_out", "kernel"))
    params = {"decoder": {"conv_out": {"kernel": jnp.asarray(w)}}}
    _, (log, _) = loss_fn(params, jnp.asarray(target), jnp.int32(0))

    # torch twin
    tw = torch.from_numpy(np.transpose(w, (3, 2, 0, 1))).requires_grad_(True)
    twd = torch.from_numpy(np.transpose(wd, (3, 2, 0, 1)))
    tz = torch.from_numpy(np.transpose(z, (0, 3, 1, 2)))
    tt = torch.from_numpy(np.transpose(target, (0, 3, 1, 2)))
    rec = F.conv2d(tz, tw, padding=1)
    nll = torch.mean(torch.abs(tt - rec))
    g = -torch.mean(F.conv2d(rec, twd, stride=2, padding=1))
    nll_g = torch.autograd.grad(nll, tw, retain_graph=True)[0]
    g_g = torch.autograd.grad(g, tw, retain_graph=True)[0]
    d_weight = (torch.norm(nll_g) / (torch.norm(g_g) + 1e-4)).clamp(0, 1e4) * 0.8
    np.testing.assert_allclose(float(log["d_weight"]), float(d_weight),
                               rtol=1e-4)


def test_kl_loss_matches_torch_formula():
    """kl_generator_loss vs a torch twin of LPIPSWithDiscriminator's
    optimizer_idx==0 branch (reference contperceptual.py:45-92): total loss,
    adaptive d_weight, and the posterior KL on an identical one-conv decoder +
    one-conv critic, posterior moments held constant."""
    rng = np.random.default_rng(7)
    w = rng.normal(size=(3, 3, 3, 3), scale=0.3).astype(np.float32)  # HWIO
    wd = rng.normal(size=(4, 4, 3, 1), scale=0.3).astype(np.float32)
    moments = rng.normal(size=(2, 8, 8, 6), scale=0.7).astype(np.float32)
    target = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
    logvar0 = 0.3

    from stedm_tpu.models.autoencoder_kl import DiagonalGaussian

    cfg = VL.VAELossConfig(disc_weight=0.8, perceptual_weight=0.0,
                           kl_weight=1e-3, logvar_init=logvar0)

    def forward(params):
        post = DiagonalGaussian(jnp.asarray(moments))
        rec = jax.lax.conv_general_dilated(
            post.mode(), params["decoder"]["conv_out"]["kernel"], (1, 1),
            "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return rec, post

    def disc_apply(rec):
        return jax.lax.conv_general_dilated(
            rec, jnp.asarray(wd), (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    loss_fn = VL.kl_generator_loss(
        cfg, forward=forward, disc_apply=disc_apply, lpips_apply=None,
        last_layer_path=("decoder", "conv_out", "kernel"))
    params = {"decoder": {"conv_out": {"kernel": jnp.asarray(w)}},
              "lossvar": {"logvar": jnp.float32(logvar0)}}
    loss, log = loss_fn(params, jnp.asarray(target), jnp.int32(0))

    # torch twin (NCHW)
    tw = torch.from_numpy(np.transpose(w, (3, 2, 0, 1))).requires_grad_(True)
    twd = torch.from_numpy(np.transpose(wd, (3, 2, 0, 1)))
    tmo = torch.from_numpy(np.transpose(moments, (0, 3, 1, 2)))
    tt = torch.from_numpy(np.transpose(target, (0, 3, 1, 2)))
    tlogvar = torch.tensor(logvar0)
    mean, logv = torch.chunk(tmo, 2, dim=1)
    logv = torch.clamp(logv, -30.0, 20.0)
    rec = F.conv2d(mean, tw, padding=1)
    rec_loss = torch.abs(tt - rec)
    nll = torch.sum(rec_loss / torch.exp(tlogvar) + tlogvar) / rec.shape[0]
    kl = 0.5 * torch.sum(mean ** 2 + torch.exp(logv) - 1.0 - logv,
                         dim=[1, 2, 3])
    kl = torch.sum(kl) / kl.shape[0]
    g = -torch.mean(F.conv2d(rec, twd, stride=2, padding=1))
    nll_g = torch.autograd.grad(nll, tw, retain_graph=True)[0]
    g_g = torch.autograd.grad(g, tw, retain_graph=True)[0]
    d_weight = (torch.norm(nll_g) / (torch.norm(g_g) + 1e-4)).clamp(0, 1e4) * 0.8
    want = nll + 1e-3 * kl + d_weight * 1.0 * g

    np.testing.assert_allclose(float(log["kl_loss"]), float(kl), rtol=1e-5)
    np.testing.assert_allclose(float(log["d_weight"]), float(d_weight),
                               rtol=1e-4)
    np.testing.assert_allclose(float(loss), float(want), rtol=1e-4)


def _tiny_codec(patch=32):
    from stedm_tpu.models.vq import VQModelInterface

    return VQModelInterface(embed_dim=3, n_embed=64, ddconfig=dict(
        double_z=False, z_channels=3, resolution=patch, in_channels=3,
        out_ch=3, ch=32, ch_mult=[1, 2], num_res_blocks=1,
        attn_resolutions=[], dropout=0.0))


def test_codebook_loss_matches_taming_legacy():
    """VectorQuantizer with_loss: taming legacy weighting — commitment at 1,
    codebook term at beta=0.25 (taming quantize.py VectorQuantizer2)."""
    from stedm_tpu.models.vq import VectorQuantizer

    vq = VectorQuantizer(n_embed=16, embed_dim=4)
    z = jnp.asarray(np.random.default_rng(0).normal(size=(2, 4, 4, 4)),
                    jnp.float32)
    params = vq.init(jax.random.PRNGKey(0), z)["params"]
    z_q, emb_loss, idx = vq.apply({"params": params}, z, with_loss=True)
    code = np.asarray(params["embedding"])
    zq_ref = code[np.asarray(idx).reshape(-1)].reshape(z.shape)
    want = (np.mean((zq_ref - np.asarray(z)) ** 2)
            + 0.25 * np.mean((zq_ref - np.asarray(z)) ** 2))
    np.testing.assert_allclose(float(emb_loss), want, rtol=1e-5)
    # ST values: z + (z_q - z) in fp32 is zq_ref up to one ulp of z's scale
    np.testing.assert_allclose(np.asarray(z_q), zq_ref, atol=1e-6)
    assert idx.shape == z.shape[:-1]


def test_ae_train_step_end_to_end():
    """Two-optimizer GAN fine-tune step on a tiny codec: finite losses, the
    discriminator engages only after disc_start, reconstruction improves."""
    import optax

    from stedm_tpu.train.ae_steps import (
        create_ae_state,
        make_ae_eval_step,
        make_ae_train_step,
    )

    patch = 32
    model = _tiny_codec(patch)
    cfg = VL.VAELossConfig(disc_start=3, disc_weight=0.5,
                           perceptual_weight=0.0, disc_ndf=16,
                           disc_num_layers=2)
    rng = jax.random.PRNGKey(0)
    gen_params = model.init(rng, jnp.zeros((1, patch, patch, 3)))["params"]
    disc = VL.build_discriminator(cfg)
    disc_vars = disc.init(jax.random.PRNGKey(1),
                          jnp.zeros((1, patch, patch, 3)))

    gen_tx = optax.adam(2e-3, b1=0.5, b2=0.9)
    disc_tx = optax.adam(2e-3, b1=0.5, b2=0.9)
    state = create_ae_state(gen_params, disc_vars, gen_tx, disc_tx)
    step = jax.jit(make_ae_train_step(model, cfg, gen_tx, disc_tx))
    eval_step = jax.jit(make_ae_eval_step(model, cfg))

    data = np.random.default_rng(5).uniform(
        -1, 1, (2, patch, patch, 3)).astype(np.float32)
    img = jnp.asarray(data)

    first = eval_step(state.gen_params, img, {})[0]
    logs = []
    for _ in range(6):
        state, log, rec = step(state, img, {})
        logs.append({k: float(v) for k, v in log.items()})
    last = eval_step(state.gen_params, img, {})[0]

    for log in logs:
        assert np.isfinite(list(log.values())).all()
    # GAN terms gated until disc_start=3 (adopt_weight)
    assert logs[0]["train/disc_factor"] == 0.0
    assert logs[-1]["train/disc_factor"] == 1.0
    assert logs[0]["train/disc_loss"] == 0.0
    assert rec.shape == img.shape
    assert float(last["val/rec_loss"]) < float(first["val/rec_loss"])
    # codebook stats are live
    assert 1.0 <= logs[-1]["train/perplexity"] <= 64.0


def _tiny_kl_codec(patch=32):
    from stedm_tpu.models.autoencoder_kl import AutoencoderKL

    return AutoencoderKL(embed_dim=3, ddconfig=dict(
        double_z=True, z_channels=3, resolution=patch, in_channels=3,
        out_ch=3, ch=32, ch_mult=[1, 2], num_res_blocks=1,
        attn_resolutions=[], dropout=0.0))


def test_kl_ae_train_step_end_to_end():
    """LPIPSWithDiscriminator fine-tune step on a tiny AutoencoderKL
    (train_ae.py variant="kl"): finite losses, disc_start gating, the output
    logvar actually trains, reconstruction improves."""
    import optax

    from stedm_tpu.train.ae_steps import (
        create_ae_state,
        make_ae_eval_step,
        make_ae_train_step,
    )

    patch = 32
    model = _tiny_kl_codec(patch)
    cfg = VL.VAELossConfig(disc_start=3, disc_weight=0.5,
                           perceptual_weight=0.0, disc_ndf=16,
                           disc_num_layers=2, kl_weight=1e-4)
    gen_params = dict(model.init(jax.random.PRNGKey(0),
                                 jnp.zeros((1, patch, patch, 3)))["params"])
    gen_params["lossvar"] = {"logvar": jnp.zeros((), jnp.float32)}
    disc = VL.build_discriminator(cfg)
    disc_vars = disc.init(jax.random.PRNGKey(1),
                          jnp.zeros((1, patch, patch, 3)))

    gen_tx = optax.adam(2e-3, b1=0.5, b2=0.9)
    disc_tx = optax.adam(2e-3, b1=0.5, b2=0.9)
    state = create_ae_state(gen_params, disc_vars, gen_tx, disc_tx)
    step = jax.jit(make_ae_train_step(model, cfg, gen_tx, disc_tx,
                                      variant="kl", seed=11))
    eval_step = jax.jit(make_ae_eval_step(model, cfg, variant="kl"))

    data = np.random.default_rng(5).uniform(
        -1, 1, (2, patch, patch, 3)).astype(np.float32)
    img = jnp.asarray(data)

    first = eval_step(state.gen_params, img, {})[0]
    logs = []
    for _ in range(6):
        state, log, rec = step(state, img, {})
        logs.append({k: float(v) for k, v in log.items()})
    last = eval_step(state.gen_params, img, {})[0]

    for log in logs:
        assert np.isfinite(list(log.values())).all()
    assert logs[0]["train/disc_factor"] == 0.0
    assert logs[-1]["train/disc_factor"] == 1.0
    assert logs[0]["train/disc_loss"] == 0.0
    assert "train/kl_loss" in logs[0] and "train/perplexity" not in logs[0]
    # the output logvar is part of optimizer 0's params (contperceptual.py:20)
    assert float(state.gen_params["lossvar"]["logvar"]) != 0.0
    assert rec.shape == img.shape
    assert float(last["val/rec_loss"]) < float(first["val/rec_loss"])
    assert float(last["val/kl_loss"]) > 0.0
