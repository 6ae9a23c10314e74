"""EncoderUNetModel (half-U-Net classifier, dead in the shipped reference
configs) parity: reference torch module (openaimodel.py:809-1024) random-init
on CPU, exported via `map_encoder_unet`, forward-compared for every pooling
head."""

import sys
from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path("/root/reference")
pytestmark = pytest.mark.skipif(not REFERENCE.exists(),
                                reason="reference checkout not mounted")
if REFERENCE.exists():
    sys.path.append(str(REFERENCE))

KW = dict(image_size=16, in_channels=3, out_channels=5, model_channels=32,
          num_res_blocks=1, attention_resolutions=[2], channel_mult=[1, 2],
          num_head_channels=16)


@pytest.mark.parametrize("pool", ["adaptive", "attention", "spatial",
                                  "spatial_v2"])
def test_encoder_unet_forward_parity(pool):
    torch = pytest.importorskip("torch")
    from ldm.modules.diffusionmodules.openaimodel import \
        EncoderUNetModel as RefEncoderUNet

    import jax

    from stedm_tpu.models.encoder_unet import EncoderUNetModel
    from stedm_tpu.utils.torch_import import map_encoder_unet

    torch.manual_seed(hash(pool) % 2 ** 31)
    ref = RefEncoderUNet(pool=pool, **KW)
    ref.eval()

    ours = EncoderUNetModel(pool=pool, **KW)
    params = map_encoder_unet(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()})

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
    t = np.array([7, 431], dtype=np.int64)
    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.from_numpy(t)).numpy()

    x_nhwc = np.transpose(x, (0, 2, 3, 1))
    got = np.asarray(ours.apply({"params": params}, x_nhwc, t))
    assert got.shape == want.shape == (2, 5)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)

    # the importer covered every parameter (no silently-uninitialized leaves)
    init_params = jax.tree.map(lambda a: a.shape,
                               ours.init(jax.random.PRNGKey(0), x_nhwc,
                                         t)["params"])
    mapped = jax.tree.map(lambda a: np.asarray(a).shape, params)
    assert init_params == mapped


def test_encoder_unet_resblock_updown_and_ssn():
    """Config axes the pool test doesn't touch: resblock up/downsampling and
    scale-shift norm (openaimodel.py:833,832)."""
    torch = pytest.importorskip("torch")
    from ldm.modules.diffusionmodules.openaimodel import \
        EncoderUNetModel as RefEncoderUNet

    from stedm_tpu.models.encoder_unet import EncoderUNetModel
    from stedm_tpu.utils.torch_import import map_encoder_unet

    kw = dict(KW, resblock_updown=True, use_scale_shift_norm=True)
    torch.manual_seed(11)
    ref = RefEncoderUNet(pool="adaptive", **kw)
    ref.eval()
    ours = EncoderUNetModel(pool="adaptive", **kw)
    params = map_encoder_unet(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()})

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
    t = np.array([0, 999], dtype=np.int64)
    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.from_numpy(t)).numpy()
    got = np.asarray(ours.apply({"params": params},
                                np.transpose(x, (0, 2, 3, 1)), t))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)
