"""Full DDIM trajectory parity: the reference's own `DDIMSampler` loop (torch, CPU)
vs our scanned sampler, with identical imported U-Net weights, schedule, CFG and
starting noise. This composes every piece — timestep selection, buffer indexing,
rescaled CFG, layout conversion — across a multi-step trajectory
(SURVEY.md §7 step 10 without a released checkpoint)."""

import sys
from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path("/root/reference")
pytestmark = pytest.mark.skipif(not REFERENCE.exists(),
                                reason="reference checkout not mounted")
if REFERENCE.exists():
    sys.path.append(str(REFERENCE))

UNET_KW = dict(image_size=32, in_channels=6, out_channels=3, model_channels=32,
               attention_resolutions=[32, 16, 8], num_res_blocks=1,
               channel_mult=[1, 2], num_heads=4)
T, START, END = 1000, 0.0015, 0.0205
STEPS, CFG_SCALE = 10, 1.5


class _RefModelShim:
    """The attribute surface `DDIMSampler` needs, wrapping the torch U-Net with
    'hybrid' conditioning (reference DiffusionWrapper, ddpm.py:1414-1417)."""

    parameterization = "eps"

    def __init__(self, unet, schedule_np):
        import torch

        self.unet = unet
        self.device = torch.device("cpu")
        self.num_timesteps = T
        self.betas = torch.tensor(schedule_np["betas"], dtype=torch.float32)
        self.alphas_cumprod = torch.tensor(schedule_np["ac"], dtype=torch.float32)
        self.alphas_cumprod_prev = torch.tensor(schedule_np["acp"],
                                                dtype=torch.float32)
        self.sqrt_one_minus_alphas_cumprod = torch.sqrt(1 - self.alphas_cumprod)

    def apply_model(self, x, t, cond):
        import torch

        xc = torch.cat([x] + cond["c_concat"], dim=1)
        cc = torch.cat(cond["c_crossattn"], 1)
        with torch.no_grad():
            return self.unet(xc, t, context=cc)


def test_ddim_trajectory_matches_reference_sampler():
    import torch
    from ldm.models.diffusion.ddim import DDIMSampler

    import jax
    import jax.numpy as jnp

    from stedm_tpu.core.ddim import DDIMParams, ddim_sample
    from stedm_tpu.core.schedules import DiffusionSchedule, make_beta_schedule
    from stedm_tpu.models.unet import UNet
    from stedm_tpu.utils.torch_import import map_unet, merge_loaded
    from ldm.modules.diffusionmodules.openaimodel import UNetModel

    torch.manual_seed(0)
    tm = UNetModel(**UNET_KW).eval()
    with torch.no_grad():  # un-zero the zero-init convs for a non-trivial net
        for p in tm.parameters():
            if p.ndim > 1 and p.abs().sum() == 0:
                p.add_(torch.randn_like(p) * 0.02)

    betas = make_beta_schedule("linear", T, START, END)
    ac = np.cumprod(1 - betas)
    shim = _RefModelShim(tm, {"betas": betas, "ac": ac,
                              "acp": np.append(1.0, ac[:-1])})

    class CPUSampler(DDIMSampler):
        def register_buffer(self, name, attr):  # the reference pins to CUDA
            setattr(self, name, attr)

    rng = np.random.default_rng(0)
    b, hw = 2, 8
    x_T = rng.normal(size=(b, 3, hw, hw)).astype(np.float32)
    seg = rng.normal(size=(b, 3, hw, hw)).astype(np.float32)
    style_c = rng.normal(size=(b, 128)).astype(np.float32)
    style_u = rng.normal(size=(b, 128)).astype(np.float32)

    cond = {"c_concat": [torch.from_numpy(seg)],
            "c_crossattn": [torch.from_numpy(style_c)]}
    uncond = {"c_concat": [torch.from_numpy(seg)],
              "c_crossattn": [torch.from_numpy(style_u)]}
    sampler = CPUSampler(shim)
    with torch.no_grad():
        ref_out, _ = sampler.sample(
            STEPS, b, (3, hw, hw), conditioning=cond, eta=0.0, verbose=False,
            x_T=torch.from_numpy(x_T),
            unconditional_guidance_scale=CFG_SCALE,
            unconditional_conditioning=uncond)
    ref_out = np.transpose(ref_out.numpy(), (0, 2, 3, 1))

    # ours: identical weights via the importer, scanned sampler, batched CFG
    model = UNet(in_channels=6, out_channels=3, model_channels=32,
                 num_res_blocks=1, channel_mult=(1, 2), num_heads=4,
                 attention_resolutions=(32, 16, 8))
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((b, hw, hw, 6)),
                           jnp.zeros((b,), jnp.int32), jnp.zeros((b, 128)))
    params = merge_loaded(variables["params"], map_unet(sd, root=""))

    seg_nhwc = jnp.asarray(np.transpose(seg, (0, 2, 3, 1)))
    ctx2 = jnp.concatenate([jnp.asarray(style_c), jnp.asarray(style_u)])
    seg2 = jnp.concatenate([seg_nhwc, seg_nhwc])

    def eps_fn(x, t):
        x2 = jnp.concatenate([x, x])
        xc = jnp.concatenate([x2, seg2], axis=-1)
        e = model.apply({"params": params}, xc, jnp.concatenate([t, t]), ctx2)
        return e[:b], e[b:]

    schedule = DiffusionSchedule.create("linear", T, START, END)
    ddim = DDIMParams.create(schedule, STEPS, eta=0.0)
    ours = np.asarray(ddim_sample(
        eps_fn, jnp.asarray(np.transpose(x_T, (0, 2, 3, 1))), ddim,
        cfg_scale=CFG_SCALE, rescale_phi=0.7))

    # 10 full steps of compounded model+schedule+CFG math across frameworks
    np.testing.assert_allclose(ours, ref_out, rtol=5e-3, atol=5e-3)
    assert np.abs(ours - ref_out).max() < 5e-3

    # ---- stochastic DDIM (eta=0.3, VERDICT r2 missing #3) ----------------
    # reference ddim.py:206 adds sigma_t * noise_like(...) each step; to compare
    # trajectories the torch sampler is fed OUR per-step noise sequence (the
    # jax draws ddim_sample makes from split(rng), key 0 = highest-noise step)
    import ldm.models.diffusion.ddim as ref_ddim_mod

    eta = 0.3
    step_rng = jax.random.PRNGKey(21)
    step_keys = jax.random.split(step_rng, STEPS)
    noises = [np.asarray(jax.random.normal(k, (b, hw, hw, 3), jnp.float32))
              for k in step_keys]
    queue = [torch.from_numpy(np.transpose(n, (0, 3, 1, 2))) for n in noises]

    orig_noise_like = ref_ddim_mod.noise_like
    ref_ddim_mod.noise_like = lambda shape, device, repeat=False: queue.pop(0)
    try:
        with torch.no_grad():
            ref_sto, _ = CPUSampler(shim).sample(
                STEPS, b, (3, hw, hw), conditioning=cond, eta=eta, verbose=False,
                x_T=torch.from_numpy(x_T),
                unconditional_guidance_scale=CFG_SCALE,
                unconditional_conditioning=uncond)
    finally:
        ref_ddim_mod.noise_like = orig_noise_like
    assert not queue, "reference consumed fewer noise draws than steps"
    ref_sto = np.transpose(ref_sto.numpy(), (0, 2, 3, 1))

    ddim_sto = DDIMParams.create(schedule, STEPS, eta=eta)
    ours_sto = np.asarray(ddim_sample(
        eps_fn, jnp.asarray(np.transpose(x_T, (0, 2, 3, 1))), ddim_sto,
        cfg_scale=CFG_SCALE, rescale_phi=0.7, rng=step_rng))
    np.testing.assert_allclose(ours_sto, ref_sto, rtol=5e-3, atol=5e-3)
    # the injected noise genuinely perturbed the trajectory
    assert np.abs(ours_sto - ours).max() > 1e-3


@pytest.mark.slow
@pytest.mark.skipif(not __import__("os").environ.get("STEDM_RUN_SLOW"),
                    reason="flagship-scale parity is slow; set STEDM_RUN_SLOW=1")
def test_flagship_arch_50_step_trajectory():
    """VERDICT r1 #10: the real landscape architecture (model_channels 128,
    ch_mult (1,4,8), 2 res-blocks, 8 heads — the 234M-param denoiser) through the
    importer for a full 50-step DDIM CFG trajectory vs the reference's own
    sampler (reference ldm/models/diffusion/ddim.py:112-210). Run at a 32^2
    latent (the arch is resolution-agnostic) to keep CPU time bounded.
    Tolerance documented: fp32 on both sides, 50 compounded steps."""
    import torch
    from ldm.models.diffusion.ddim import DDIMSampler
    from ldm.modules.diffusionmodules.openaimodel import UNetModel

    import jax
    import jax.numpy as jnp

    from stedm_tpu.core.ddim import DDIMParams, ddim_sample
    from stedm_tpu.core.schedules import DiffusionSchedule, make_beta_schedule
    from stedm_tpu.models.unet import UNet
    from stedm_tpu.utils.torch_import import map_unet, merge_loaded

    kw = dict(image_size=64, in_channels=6, out_channels=3, model_channels=128,
              attention_resolutions=[32, 16, 8], num_res_blocks=2,
              channel_mult=[1, 4, 8], num_heads=8)
    steps = 50
    torch.manual_seed(0)
    tm = UNetModel(**kw).eval()
    with torch.no_grad():
        for p in tm.parameters():
            if p.ndim > 1 and p.abs().sum() == 0:
                p.add_(torch.randn_like(p) * 0.02)

    betas = make_beta_schedule("linear", T, START, END)
    ac = np.cumprod(1 - betas)
    shim = _RefModelShim(tm, {"betas": betas, "ac": ac,
                              "acp": np.append(1.0, ac[:-1])})

    class CPUSampler(DDIMSampler):
        def register_buffer(self, name, attr):
            setattr(self, name, attr)

    rng = np.random.default_rng(0)
    b, hw = 1, 32
    x_T = rng.normal(size=(b, 3, hw, hw)).astype(np.float32)
    seg = rng.normal(size=(b, 3, hw, hw)).astype(np.float32)
    style_c = rng.normal(size=(b, 512)).astype(np.float32)
    style_u = rng.normal(size=(b, 512)).astype(np.float32)

    cond = {"c_concat": [torch.from_numpy(seg)],
            "c_crossattn": [torch.from_numpy(style_c)]}
    uncond = {"c_concat": [torch.from_numpy(seg)],
              "c_crossattn": [torch.from_numpy(style_u)]}
    with torch.no_grad():
        ref_out, _ = CPUSampler(shim).sample(
            steps, b, (3, hw, hw), conditioning=cond, eta=0.0, verbose=False,
            x_T=torch.from_numpy(x_T),
            unconditional_guidance_scale=CFG_SCALE,
            unconditional_conditioning=uncond)
    ref_out = np.transpose(ref_out.numpy(), (0, 2, 3, 1))

    model = UNet(in_channels=6, out_channels=3, model_channels=128,
                 num_res_blocks=2, channel_mult=(1, 4, 8), num_heads=8,
                 attention_resolutions=(32, 16, 8))
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((b, hw, hw, 6)),
                           jnp.zeros((b,), jnp.int32), jnp.zeros((b, 512)))
    params = merge_loaded(variables["params"], map_unet(sd, root=""))

    seg_nhwc = jnp.asarray(np.transpose(seg, (0, 2, 3, 1)))
    ctx2 = jnp.concatenate([jnp.asarray(style_c), jnp.asarray(style_u)])

    def eps_fn(x, t):  # shared-encoder CFG fan-out (bottleneck-only conditioning)
        xc = jnp.concatenate([x, seg_nhwc], axis=-1)
        e = model.apply({"params": params}, xc, t, ctx2)
        return e[:b], e[b:]

    schedule = DiffusionSchedule.create("linear", T, START, END)
    ddim = DDIMParams.create(schedule, steps, eta=0.0)
    ours = np.asarray(ddim_sample(
        eps_fn, jnp.asarray(np.transpose(x_T, (0, 2, 3, 1))), ddim,
        cfg_scale=CFG_SCALE, rescale_phi=0.7))

    # 50 compounded steps x 234M params, fp32 both sides: keep 1e-2 headroom
    np.testing.assert_allclose(ours, ref_out, rtol=1e-2, atol=1e-2)
