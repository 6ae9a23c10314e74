"""Numerical parity: torch reference modules vs our Flax modules via the importer.

Instantiates the *reference* torch models (random init) on CPU, exports their
state_dicts through `stedm_tpu.utils.torch_import`, and compares forward outputs on
fixed inputs. Skipped when the reference checkout is not mounted.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path("/root/reference")
pytestmark = pytest.mark.skipif(not REFERENCE.exists(),
                                reason="reference checkout not mounted")

if REFERENCE.exists():
    # append (not prepend): the reference also ships train_diff.py etc. which must
    # not shadow this repo's entry points during the test session
    sys.path.append(str(REFERENCE))


@pytest.fixture(scope="module")
def torch_mods():
    torch = pytest.importorskip("torch")
    from ldm.modules.diffusionmodules.openaimodel import UNetModel  # noqa: E402
    from ldm.modules.diffusionmodules.model import Decoder, Encoder  # noqa: E402

    return torch, UNetModel, Encoder, Decoder


UNET_KW = dict(image_size=32, in_channels=6, out_channels=3, model_channels=32,
               attention_resolutions=[32, 16, 8], num_res_blocks=2,
               channel_mult=[1, 4, 8], num_heads=8)


def test_unet_forward_parity(torch_mods):
    torch, UNetModel, _, _ = torch_mods
    import jax
    import jax.numpy as jnp

    from stedm_tpu.models.unet import UNet
    from stedm_tpu.utils.torch_import import map_unet, merge_loaded

    torch.manual_seed(0)
    tm = UNetModel(**UNET_KW).eval()
    # un-zero the zero_module convs so the comparison is non-trivial
    with torch.no_grad():
        for name, p in tm.named_parameters():
            if p.abs().sum() == 0 and p.ndim > 1:
                p.add_(torch.randn_like(p) * 0.02)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    model = UNet(in_channels=6, out_channels=3, model_channels=32,
                 num_res_blocks=2, channel_mult=(1, 4, 8), num_heads=8,
                 attention_resolutions=(32, 16, 8))
    x = np.random.default_rng(0).normal(size=(2, 16, 16, 6)).astype(np.float32)
    t = np.array([3, 977], dtype=np.int64)
    # style context must be 4*model_channels wide (ResBlockStyle rides the
    # time-embedding pathway, reference openaimodel.py:291-297)
    ctx = np.random.default_rng(1).normal(size=(2, 128)).astype(np.float32)

    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           jnp.asarray(t.astype(np.int32)), jnp.asarray(ctx))
    params = merge_loaded(variables["params"], map_unet(sd, root=""))
    y_jax = np.asarray(model.apply({"params": params}, jnp.asarray(x),
                                   jnp.asarray(t.astype(np.int32)), jnp.asarray(ctx)))

    with torch.no_grad():
        y_t = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
                 torch.from_numpy(t), context=torch.from_numpy(ctx))
    y_torch = np.transpose(y_t.numpy(), (0, 2, 3, 1))

    np.testing.assert_allclose(y_jax, y_torch, rtol=1e-3, atol=2e-4)


DD = dict(double_z=False, z_channels=3, resolution=64, in_channels=3, out_ch=3,
          ch=32, ch_mult=[1, 2], num_res_blocks=1, attn_resolutions=[], dropout=0.0)


def test_vq_encoder_decoder_parity(torch_mods):
    torch, _, Encoder, Decoder = torch_mods
    import jax
    import jax.numpy as jnp

    from stedm_tpu.models.vq import VQDecoder, VQEncoder
    from stedm_tpu.utils.torch_import import map_vq, merge_loaded

    torch.manual_seed(1)
    te = Encoder(**DD).eval()
    td = Decoder(**DD).eval()
    sd = {f"encoder.{k}": v.detach().numpy() for k, v in te.state_dict().items()}
    sd.update({f"decoder.{k}": v.detach().numpy() for k, v in td.state_dict().items()})
    loaded = map_vq(sd)

    je = VQEncoder(ch=32, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(),
                   resolution=64, z_channels=3, double_z=False)
    jd = VQDecoder(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                   attn_resolutions=(), resolution=64, z_channels=3)

    x = np.random.default_rng(2).normal(size=(1, 32, 32, 3)).astype(np.float32)
    ve = je.init(jax.random.PRNGKey(0), jnp.asarray(x))
    pe = merge_loaded(ve["params"], loaded["encoder"])
    h_jax = np.asarray(je.apply({"params": pe}, jnp.asarray(x)))
    with torch.no_grad():
        h_t = te(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    np.testing.assert_allclose(h_jax, np.transpose(h_t, (0, 2, 3, 1)),
                               rtol=1e-3, atol=2e-4)

    z = np.random.default_rng(3).normal(size=(1, 16, 16, 3)).astype(np.float32)
    vd = jd.init(jax.random.PRNGKey(0), jnp.asarray(z))
    pd = merge_loaded(vd["params"], loaded["decoder"])
    y_jax = np.asarray(jd.apply({"params": pd}, jnp.asarray(z)))
    with torch.no_grad():
        y_t = td(torch.from_numpy(np.transpose(z, (0, 3, 1, 2)))).numpy()
    np.testing.assert_allclose(y_jax, np.transpose(y_t, (0, 2, 3, 1)),
                               rtol=1e-3, atol=2e-4)


def test_spatial_rescaler_parity(torch_mods):
    torch = torch_mods[0]
    import jax
    import jax.numpy as jnp

    from ldm.modules.encoders.modules import SpatialRescaler as TorchRescaler
    from stedm_tpu.models.cond import SpatialRescaler
    from stedm_tpu.utils.torch_import import _conv_w

    torch.manual_seed(2)
    tm = TorchRescaler(n_stages=2, in_channels=2, out_channels=3).eval()
    jm = SpatialRescaler(n_stages=2, in_channels=2, out_channels=3)

    x = np.random.default_rng(4).normal(size=(1, 64, 64, 2)).astype(np.float32)
    v = jm.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = {"channel_mapper": {
        "kernel": _conv_w(tm.channel_mapper.weight.detach().numpy())}}
    y_jax = np.asarray(jm.apply({"params": params}, jnp.asarray(x)))
    with torch.no_grad():
        y_t = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    np.testing.assert_allclose(y_jax, np.transpose(y_t, (0, 2, 3, 1)),
                               rtol=1e-4, atol=1e-5)
