"""Tests for the hydra-style composition engine against the shipped config surface."""

from pathlib import Path

from stedm_tpu.config import compose

CONF = Path(__file__).resolve().parents[1] / "configs"


def test_compose_diff_defaults():
    cfg = compose("config_diff", config_dir=CONF)
    assert cfg.name == "diff"
    assert cfg.num_epochs == 25
    assert cfg.base_lr == 1e-7
    assert cfg.style_drop_rate == 0.25
    assert cfg.data.name == "flowers"
    assert cfg.data.patch_size == 512
    assert cfg.data.ratios == [1.0]
    assert "flowers_anno" in cfg.data.dataset
    assert cfg.data.dataset.flowers_anno.file == "stedm_tpu.data.flowers.Flowers_DM_Anno"
    assert cfg.diffusion.timesteps == 1000
    assert cfg.diffusion.linear_start == 0.0015
    assert cfg.diffusion.unet_config.params.channel_mult == [1, 4, 8]
    assert cfg.diffusion.first_stage_config.params.n_embed == 8192
    assert cfg.diffusion.cond_stage_config.params.n_stages == 2
    assert cfg.style_sampling.name == "nearby"
    assert cfg.style_agg.name == "linear"
    assert cfg.location.name == "tpu"


def test_compose_group_override():
    cfg = compose("config_diff", ["data=her2", "style_sampling=mp", "style_agg=svit"],
                  config_dir=CONF)
    assert cfg.data.name == "her2"
    assert cfg.data.base_scale == 2
    assert "her2_anno" in cfg.data.dataset
    assert cfg.style_sampling.num_patches == 10
    assert cfg.style_agg.patch_size == 8


def test_compose_readme_style_overrides():
    """The reference README's train_seg invocation shape (README.md:50)."""
    cfg = compose(
        "config_seg",
        ["data=her2", "data/dataset=[her2_anno,her2_syn]", "data.ratios=[0.2,0.8]",
         "+ckpt_name=test_ckpt", "location.data_dir=/tmp/x"],
        config_dir=CONF)
    assert set(cfg.data.dataset.keys()) == {"her2_anno", "her2_syn"}
    assert cfg.data.ratios == [0.2, 0.8]
    assert cfg.ckpt_name == "test_ckpt"
    assert cfg.location.data_dir == "/tmp/x"
    # package-redirected sub-defaults land inside the dataset entry
    assert cfg.data.dataset.her2_anno.annotator.users == [99]
    assert cfg.data.dataset.her2_anno.anno_server.user == "exact"


def test_compose_predict_has_sampling_params():
    cfg = compose("config_predict", ["cfg_scale=3.0"], config_dir=CONF)
    assert cfg.ddim_steps == 128
    assert cfg.eta == 0.0
    assert cfg.cfg_scale == 3.0
    assert cfg.rescale_phi == 0.7


def test_value_override_types():
    cfg = compose("config_diff", ["num_epochs=3", "lr=0.001", "data.samples=16"],
                  config_dir=CONF)
    assert cfg.num_epochs == 3 and isinstance(cfg.num_epochs, int)
    assert abs(cfg.lr - 0.001) < 1e-12
    assert cfg.data.samples == 16
