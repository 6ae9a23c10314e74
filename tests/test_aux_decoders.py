"""Forward parity: reference aux decoder/rescaler modules (model.py:571-835,
dead in the reference) vs `stedm_tpu/models/aux_decoders.py` via the importer.

Same protocol as tests/test_torch_parity.py: instantiate the *reference* torch
modules (random init), export state_dicts through `stedm_tpu.utils.torch_import`,
compare forwards on fixed inputs (NCHW torch vs NHWC here)."""

import sys
from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path("/root/reference")
pytestmark = pytest.mark.skipif(not REFERENCE.exists(),
                                reason="reference checkout not mounted")

if REFERENCE.exists():
    sys.path.append(str(REFERENCE))


@pytest.fixture(scope="module")
def ref_mod():
    torch = pytest.importorskip("torch")
    import ldm.modules.diffusionmodules.model as ref_model  # noqa: E402

    return torch, ref_model


def _nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


def _nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def _compare(torch, tm, jm, loaded, x_nhwc, **apply_kw):
    import jax
    import jax.numpy as jnp

    from stedm_tpu.utils.torch_import import merge_loaded

    variables = jm.init(jax.random.PRNGKey(0), jnp.asarray(x_nhwc), **apply_kw)
    params = merge_loaded(variables["params"], loaded)
    y_jax = np.asarray(jm.apply({"params": params}, jnp.asarray(x_nhwc),
                                **apply_kw))
    with torch.no_grad():
        y_t = tm(torch.from_numpy(_nchw(x_nhwc))).numpy()
    if y_t.ndim == 4:
        y_t = _nhwc(y_t)
    np.testing.assert_allclose(y_jax, y_t, rtol=1e-3, atol=2e-4)


def test_simple_decoder_parity(ref_mod):
    torch, ref_model = ref_mod
    from stedm_tpu.models.aux_decoders import SimpleDecoder
    from stedm_tpu.utils.torch_import import map_simple_decoder

    torch.manual_seed(0)
    tm = ref_model.SimpleDecoder(32, 3).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    x = np.random.default_rng(0).normal(size=(2, 8, 8, 32)).astype(np.float32)
    _compare(torch, tm, SimpleDecoder(in_channels=32, out_channels=3),
             map_simple_decoder(sd), x)


def test_upsample_decoder_parity(ref_mod):
    torch, ref_model = ref_mod
    from stedm_tpu.models.aux_decoders import UpsampleDecoder
    from stedm_tpu.utils.torch_import import map_upsample_decoder

    torch.manual_seed(1)
    tm = ref_model.UpsampleDecoder(in_channels=32, out_channels=3, ch=32,
                                   num_res_blocks=1, resolution=16,
                                   ch_mult=(1, 2)).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    x = np.random.default_rng(1).normal(size=(1, 8, 8, 32)).astype(np.float32)
    _compare(torch, tm,
             UpsampleDecoder(in_channels=32, out_channels=3, ch=32,
                             num_res_blocks=1, resolution=16, ch_mult=(1, 2)),
             map_upsample_decoder(sd), x)


def test_latent_rescaler_parity_noninteger_factor(ref_mod):
    # factor 1.5 exercises the legacy-nearest indexing (8 -> 12) where
    # half-pixel-center nearest would differ
    torch, ref_model = ref_mod
    from stedm_tpu.models.aux_decoders import LatentRescaler
    from stedm_tpu.utils.torch_import import map_latent_rescaler

    torch.manual_seed(2)
    tm = ref_model.LatentRescaler(factor=1.5, in_channels=32, mid_channels=64,
                                  out_channels=32, depth=1).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    x = np.random.default_rng(2).normal(size=(1, 8, 8, 32)).astype(np.float32)
    _compare(torch, tm,
             LatentRescaler(factor=1.5, in_channels=32, mid_channels=64,
                            out_channels=32, depth=1),
             map_latent_rescaler(sd), x)


def test_merged_rescale_encoder_parity(ref_mod):
    torch, ref_model = ref_mod
    from stedm_tpu.models.aux_decoders import MergedRescaleEncoder
    from stedm_tpu.utils.torch_import import map_merged_rescale_encoder

    torch.manual_seed(3)
    kw = dict(in_channels=3, ch=32, resolution=16, out_ch=16, num_res_blocks=1,
              attn_resolutions=[], ch_mult=(1, 2), rescale_factor=1.0,
              rescale_module_depth=1)
    tm = ref_model.MergedRescaleEncoder(**kw).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    x = np.random.default_rng(3).normal(size=(1, 16, 16, 3)).astype(np.float32)
    _compare(torch, tm, MergedRescaleEncoder(**kw),
             map_merged_rescale_encoder(sd), x)


def test_merged_rescale_decoder_parity(ref_mod):
    torch, ref_model = ref_mod
    from stedm_tpu.models.aux_decoders import MergedRescaleDecoder
    from stedm_tpu.utils.torch_import import map_merged_rescale_decoder

    torch.manual_seed(4)
    kw = dict(z_channels=16, out_ch=3, resolution=16, num_res_blocks=1,
              attn_resolutions=[], ch=32, ch_mult=(1, 2), rescale_factor=1.0,
              rescale_module_depth=1)
    tm = ref_model.MergedRescaleDecoder(**kw).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    x = np.random.default_rng(4).normal(size=(1, 8, 8, 16)).astype(np.float32)
    _compare(torch, tm, MergedRescaleDecoder(**kw),
             map_merged_rescale_decoder(sd), x)


def test_upsampler_parity(ref_mod):
    torch, ref_model = ref_mod
    from stedm_tpu.models.aux_decoders import Upsampler
    from stedm_tpu.utils.torch_import import map_merged_rescale_decoder

    torch.manual_seed(5)
    tm = ref_model.Upsampler(in_size=8, out_size=16, in_channels=32,
                             out_channels=3, ch_mult=2).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    x = np.random.default_rng(5).normal(size=(1, 8, 8, 32)).astype(np.float32)
    _compare(torch, tm,
             Upsampler(in_size=8, out_size=16, in_channels=32, out_channels=3,
                       ch_mult=2),
             map_merged_rescale_decoder(sd), x)


def test_first_stage_post_processor_parity(ref_mod):
    torch, ref_model = ref_mod
    from stedm_tpu.models.aux_decoders import FirstStagePostProcessor
    from stedm_tpu.utils.torch_import import map_first_stage_post

    class _IdentityEncode(torch.nn.Module):
        # IdentityFirstStage.encode semantics (reference autoencoder.py:426-443)
        # without importing it (the module pulls pytorch_lightning)
        def encode(self, x, *a, **k):
            return x

    # reference model.py:818 uses DiagonalGaussianDistribution without
    # importing it — the class would NameError if ever run as shipped; patch a
    # never-matching placeholder so its forward can execute for the comparison
    if not hasattr(ref_model, "DiagonalGaussianDistribution"):
        ref_model.DiagonalGaussianDistribution = type(
            "_NeverMatches", (), {})

    torch.manual_seed(6)
    tm = ref_model.FirstStagePostProcessor(
        ch_mult=[1, 2], in_channels=8, pretrained_model=_IdentityEncode(),
        reshape=True, n_channels=32).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    x = np.random.default_rng(6).normal(size=(1, 8, 8, 8)).astype(np.float32)

    import jax
    import jax.numpy as jnp

    from stedm_tpu.utils.torch_import import merge_loaded

    jm = FirstStagePostProcessor(ch_mult=(1, 2), in_channels=8, n_channels=32,
                                 do_reshape=True)
    variables = jm.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = merge_loaded(variables["params"], map_first_stage_post(sd))
    y_jax = np.asarray(jm.apply({"params": params}, jnp.asarray(x)))
    with torch.no_grad():
        # torch consumes NCHW; reshape=True emits [B, H*W, C] on both sides
        y_t = tm(torch.from_numpy(_nchw(x))).numpy()
    np.testing.assert_allclose(y_jax, y_t, rtol=1e-3, atol=2e-4)


def test_resize_matches_torch_interpolate(ref_mod):
    torch, _ = ref_mod
    import torch.nn.functional as F

    from stedm_tpu.models.aux_decoders import resize

    x = np.random.default_rng(7).normal(size=(1, 8, 8, 4)).astype(np.float32)
    t = torch.from_numpy(_nchw(x))
    for scale, mode in ((0.5, "bilinear"), (2.0, "bilinear"), (1.5, "nearest")):
        with torch.no_grad():
            y_t = F.interpolate(t, scale_factor=scale, mode=mode,
                                **({"align_corners": False}
                                   if mode == "bilinear" else {})).numpy()
        y_j = np.asarray(resize(x, scale_factor=scale, mode=mode))
        np.testing.assert_allclose(y_j, _nhwc(y_t), rtol=1e-5, atol=1e-5,
                                   err_msg=f"scale={scale} mode={mode}")
    assert resize(x) is x  # scale 1.0 passthrough (reference :764-765)
