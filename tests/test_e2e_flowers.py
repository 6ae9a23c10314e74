"""End-to-end smoke over the real entry points on generated tiny Flowers data:
train_diff (2 steps) -> predict_diff writes img/seg pairs -> syn dataset loads them.

Mirrors the reference's three-command workflow (README.md:34-51) at toy scale.
"""

import os
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


@pytest.fixture(scope="module")
def flowers_dir(tmp_path_factory):
    """Write a miniature Flowers-102 tree: imgs/, segs/, imagelabels.mat, setid.mat."""
    import scipy.io

    root = tmp_path_factory.mktemp("data")
    base = root / "flowers"
    (base / "imgs").mkdir(parents=True)
    (base / "segs").mkdir(parents=True)

    rng = np.random.default_rng(0)
    n = 24
    labels = np.array([(i % 6) + 1 for i in range(n)])  # classes 1..6 (1-based)
    train_ids, val_ids, test_ids = [], [], []
    for i in range(n):
        img = rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
        seg = np.zeros((40, 40, 3), dtype=np.uint8)
        seg[:, :, 2] = 255  # blue background
        seg[10:30, 10:30] = [200, 200, 0]  # foreground blob
        Image.fromarray(img).save(base / "imgs" / f"image_{str(i + 1).zfill(5)}.jpg")
        Image.fromarray(seg).save(base / "segs" / f"segmim_{str(i + 1).zfill(5)}.jpg")
        (train_ids if i % 3 == 0 else val_ids if i % 3 == 1 else test_ids).append(i + 1)

    scipy.io.savemat(base / "imagelabels.mat", {"labels": labels[None]})
    scipy.io.savemat(base / "setid.mat",
                     {"trnid": np.array(train_ids)[None],
                      "valid": np.array(val_ids)[None],
                      "tstid": np.array(test_ids)[None]})
    return root


TINY_OVERRIDES = [
    "data.patch_size=32",
    "data.samples=4",
    "data.batch_size=2",
    "data.class_train_samples=2",
    "num_epochs=1",
    "lr=1e-4",
    "location=pc",
    "style_sampling=augmented",
    "style_agg=mean",
    # tiny model
    "diffusion.unet_config.params.model_channels=32",
    "diffusion.unet_config.params.num_res_blocks=1",
    "diffusion.unet_config.params.channel_mult=[1,2]",
    "diffusion.unet_config.params.num_heads=4",
    "diffusion.first_stage_config.params.ddconfig.ch=32",
    "diffusion.first_stage_config.params.ddconfig.num_res_blocks=1",
    "diffusion.first_stage_config.params.n_embed=64",
    # shrink the swin backbone via mean agg (full swin is too slow for smoke)
]
# the class lists must cover all 102 bins (reference flowers_dm.py:106-113 raises
# for any unassigned class)
_UNANNO = str(list(range(3, 102))).replace(" ", "")
CLASS_OVERRIDES = [
    "data/dataset=[flowers_anno,flowers_unanno]",
    "data.ratios=[1.0,1.0]",
    "data.dataset.flowers_anno.train_classes=[0,1,2]",
    f"data.dataset.flowers_anno.unanno_classes={_UNANNO}",
    "data.dataset.flowers_unanno.train_classes=[0,1,2]",
    f"data.dataset.flowers_unanno.unanno_classes={_UNANNO}",
]


def test_train_and_predict_entry_points(flowers_dir, tmp_path, monkeypatch):
    import train_diff as td
    import predict_diff as pd

    # epoch-end preview fixture (reference ldm_diffusion.py:128-221)
    preview_dir = flowers_dir / "test_img_diff" / "flowers"
    (preview_dir / "augmented").mkdir(parents=True, exist_ok=True)
    cond = np.zeros((32, 32), np.uint8)
    cond[8:24, 8:24] = 255
    Image.fromarray(cond).save(preview_dir / "test_c.png")
    for i in range(2):  # CFG previews use the first two styles (ldm_diffusion.py:195)
        style_img = np.random.default_rng(i).integers(0, 255, (32, 32, 3), np.uint8)
        Image.fromarray(style_img).save(preview_dir / "augmented" / f"{i}_img.png")

    result_dir = tmp_path / "results"
    overrides = TINY_OVERRIDES + CLASS_OVERRIDES + [
        f"location.data_dir={flowers_dir}",
        f"location.result_dir={result_dir}",
        "accumulate_grad_batches=1",
        "+preview_ddim_steps=4",
        # LatentDiffusion knobs (reference ddpm.py:113-117, 480-494), default-off
        "+diffusion.learn_logvar=true",
        "+diffusion.scale_by_std=true",
    ]

    td.main(overrides)
    run_dir = result_dir / "diff_flowers_augmented_mean"
    previews = list((run_dir / "previews").glob("Sample_Images_[0-9]*.png"))
    assert previews, "epoch-end preview images not written"
    cfg_previews = list((run_dir / "previews").glob("Sample_Images_CFG_*.png"))
    # style_drop_rate 0.25 > 0: guidance-3/5 variants on 2 styles (4 images)
    assert len(cfg_previews) == 4, cfg_previews
    assert (run_dir / "scale_factor.json").is_file()

    # preemption-style resume: continue into a second epoch from the checkpoint
    td.main(overrides + ["+resume=true", "num_epochs=2"])

    run_name = "diff_flowers_augmented_mean"
    ckpt = result_dir / run_name / "ckpt" / f"{run_name}_last"
    assert ckpt.is_dir(), f"checkpoint not written: {ckpt}"
    events = result_dir / run_name / "events.jsonl"
    assert events.is_file() and "Train Loss" in events.read_text()

    # +cfg_interval restricts guidance to a window of the trajectory
    # (arXiv 2404.07724; cond-only evaluation outside it)
    pd.main(overrides + ["data.samples=1", "ddim_steps=4", "cfg_scale=1.5",
                         "+cfg_interval=[0,0.6]"])

    syn_dir = flowers_dir / "syn_data" / "flowers"
    imgs = sorted(syn_dir.glob("img_*.png"))
    segs = sorted(syn_dir.glob("seg_*.png"))
    assert len(imgs) >= 2 and len(segs) == len(imgs)
    arr = np.array(Image.open(imgs[0]))
    assert arr.shape == (32, 32, 3)
    seg_arr = np.array(Image.open(segs[0]))
    assert set(np.unique(seg_arr)) <= {0, 1}

    # DDP-sharded predict (reference predict_diff.py:84-89): 8 virtual devices,
    # ragged final batch padded by row cycling
    pd.main(overrides + [
        "data.samples=1", "ddim_steps=4", "cfg_scale=1.5", "location=tpu",
        f"location.data_dir={flowers_dir}", f"location.result_dir={result_dir}",
        "location.n_workers=2", "+predict_name=flowers_dp",
    ])
    dp_dir = flowers_dir / "syn_data" / "flowers_dp"
    assert len(list(dp_dir.glob("img_*.png"))) >= 2

    # canvas synthesis: 4 layout patches mosaicked into one 64^2 canvas, sampled
    # through the tiled eps/decode path (reference fold/unfold role, ddpm.py:905-987)
    pd.main(overrides + [
        "data.samples=2", "data.batch_size=4", "ddim_steps=4", "cfg_scale=1.5",
        "+canvas_size=64", "+predict_name=flowers_canvas",
    ])
    canvas_dir = flowers_dir / "syn_data" / "flowers_canvas"
    canvas_imgs = list(canvas_dir.glob("img_*.png"))
    assert canvas_imgs, "no canvas images written"
    arr = np.array(Image.open(canvas_imgs[0]))
    assert arr.shape == (64, 64, 3)

    # non-uniform serving mode through the CLI: +cache_schedule=auto:R
    # calibrates refresh placement on the first predict batch (one exact drift
    # -measuring trajectory, train/calibrate.py) and samples with the
    # scheduled deep-feature cache (core/cache_schedule.py)
    pd.main(overrides + [
        "data.samples=1", "ddim_steps=4", "cfg_scale=1.5",
        "+cache_schedule=auto:2", "+predict_name=flowers_sched",
    ])
    sched_dir = flowers_dir / "syn_data" / "flowers_sched"
    assert len(list(sched_dir.glob("img_*.png"))) >= 2

    # cross-block cache carry through the CLI: +host_loop drives the block
    # sampler (1-device pc mesh), +unroll=3 forces multiple blocks, and
    # +block_carry threads the deep-feature cache between block programs —
    # the second block starts mid-refresh-period and consumes the carried
    # cache (host_sampler.py carry_cache)
    pd.main(overrides + [
        "data.samples=1", "ddim_steps=8", "cfg_scale=1.5",
        "+cache_schedule=[0,5]", "+host_loop=true", "+block_carry=true",
        "+unroll=3", "+predict_name=flowers_carry",
    ])
    carry_dir = flowers_dir / "syn_data" / "flowers_carry"
    assert len(list(carry_dir.glob("img_*.png"))) >= 2

    # THE CERTIFIED SERVING CONFIG, exactly as docs/MIGRATION.md step 4 ships
    # it (VERDICT r4 task 7): calibrated auto:5 refresh schedule composed with
    # the 0.3:0.7 guidance window, end-to-end through predict_diff.py,
    # producing img/seg pairs (tiny scale; ddim_steps=8 so 5 refreshes fit)
    pd.main(overrides + [
        "data.samples=1", "ddim_steps=8", "cfg_scale=1.5",
        "+cache_schedule=auto:5", "+cfg_interval=[0.3,0.7]",
        "+predict_name=flowers_serving",
    ])
    serving_dir = flowers_dir / "syn_data" / "flowers_serving"
    serving_imgs = sorted(serving_dir.glob("img_*.png"))
    serving_segs = sorted(serving_dir.glob("seg_*.png"))
    assert len(serving_imgs) >= 2 and len(serving_segs) == len(serving_imgs)
    arr = np.array(Image.open(serving_imgs[0]))
    assert arr.shape == (32, 32, 3) and arr.std() > 0

    # +compact_transfer: conditioning H2D'd as uint8 class indices + f16 style
    # (for slow-transfer terminals). The layout path is lossless — seg PNGs must
    # be byte-identical to the baseline run over the same deterministic loader
    # order; the f16 style cast may perturb the images themselves.
    pd.main(overrides + ["data.samples=1", "ddim_steps=4", "cfg_scale=1.5",
                         "+cfg_interval=[0,0.6]", "+compact_transfer=true",
                         "+predict_name=flowers_compact"])
    compact_dir = flowers_dir / "syn_data" / "flowers_compact"
    compact_segs = sorted(compact_dir.glob("seg_*.png"))
    assert len(compact_segs) == len(segs)
    for a, b in zip(segs, compact_segs):
        assert a.read_bytes() == b.read_bytes(), (a, b)

    # generated pairs round-trip through the syn data module
    from stedm_tpu.config import compose
    from stedm_tpu.data.dm import DataModule

    syn_cfg = compose("config_seg", [
        "data.patch_size=32", "data.samples=4", "data.batch_size=2",
        "location=pc", f"location.data_dir={flowers_dir}",
        f"location.result_dir={result_dir}",
        "data/dataset=[flowers_syn]", "data.ratios=[1.0]",
    ], config_dir=ROOT / "configs")
    dm = DataModule(syn_cfg)
    dm.setup()
    batch = next(iter(dm.train_loader()))
    img_b, one_hot_b, seg_b, style_b = batch[:4]
    assert img_b.shape == (2, 32, 32, 3)
    assert one_hot_b.shape == (2, 32, 32, 2)
    assert float(np.abs(img_b).max()) <= 1.0


def test_train_ae_entry_point(flowers_dir, tmp_path):
    """Codec fine-tune entry point (train_ae.py — the reference's dormant
    VQModel training path, autoencoder.py:135-173) at toy scale: one epoch of
    two-optimizer GAN training on tiny flowers, checkpoints + event log out."""
    import train_ae as ta

    result_dir = tmp_path / "results_ae"
    overrides = CLASS_OVERRIDES + [
        "data.patch_size=32",
        "data.samples=4",
        "data.batch_size=2",
        "data.class_train_samples=2",
        "num_epochs=1",
        "lr=1e-3",
        "location=pc",
        "style_sampling=augmented",
        "style_agg=mean",
        f"location.data_dir={flowers_dir}",
        f"location.result_dir={result_dir}",
        # tiny codec + tiny critic
        "diffusion.first_stage_config.params.ddconfig.ch=32",
        "diffusion.first_stage_config.params.ddconfig.num_res_blocks=1",
        "diffusion.first_stage_config.params.ddconfig.ch_mult=[1,2]",
        "diffusion.first_stage_config.params.n_embed=64",
        "loss.disc_start=1",
        "loss.disc_ndf=16",
        "loss.disc_num_layers=2",
        "loss.perceptual_weight=0.0",
    ]
    ta.main(overrides)

    run_dir = result_dir / "ae_flowers"
    events = run_dir / "events.jsonl"
    assert events.is_file()
    text = events.read_text()
    assert "train/total_loss" in text and "val/rec_loss" in text
    assert (run_dir / "ckpt" / "ae_flowers_last").is_dir()
    assert (run_dir / "ckpt" / "ae_flowers_best").is_dir()


def test_train_ae_kl_entry_point(flowers_dir, tmp_path):
    """KL-codec fine-tune (train_ae.py with first_stage_config=kl-f4 — the
    reference's AutoencoderKL training path, autoencoder.py:356-400 through
    LPIPSWithDiscriminator): one epoch at toy scale, KL metrics logged."""
    import train_ae as ta

    result_dir = tmp_path / "results_ae_kl"
    overrides = CLASS_OVERRIDES + [
        "diffusion/first_stage_config=kl-f4",
        "data.patch_size=32",
        "data.samples=4",
        "data.batch_size=2",
        "data.class_train_samples=2",
        "num_epochs=1",
        "lr=1e-3",
        "location=pc",
        "style_sampling=augmented",
        "style_agg=mean",
        f"location.data_dir={flowers_dir}",
        f"location.result_dir={result_dir}",
        "run_name=ae_kl",
        # tiny codec + tiny critic
        "diffusion.first_stage_config.params.ddconfig.ch=32",
        "diffusion.first_stage_config.params.ddconfig.num_res_blocks=1",
        "diffusion.first_stage_config.params.ddconfig.ch_mult=[1,2]",
        "loss.disc_start=1",
        "loss.disc_ndf=16",
        "loss.disc_num_layers=2",
        "loss.perceptual_weight=0.0",
        "loss.kl_weight=1e-4",
    ]
    ta.main(overrides)

    run_dir = result_dir / "ae_kl"
    text = (run_dir / "events.jsonl").read_text()
    assert "train/kl_loss" in text and "val/kl_loss" in text
    assert "train/logvar" in text
    assert (run_dir / "ckpt" / "ae_kl_last").is_dir()
    assert (run_dir / "ckpt" / "ae_kl_best").is_dir()
