"""Torch-checkpoint importer: map reference state_dicts into our param trees.

Needed for parity acceptance (SURVEY.md §7 step 10): load the reference's
CompVis-lineage checkpoints (vq-f4.ckpt, landscape.ckpt, trained STEDM runs) and
compare trajectories. Handles the two torch module families on the active path:

* the LDM/OpenAI U-Net (reference `ldm/modules/diffusionmodules/openaimodel.py`),
  key roots ``model.diffusion_model.`` (+ ``model_ema.`` shadow ignored),
* the VQGAN-f4 codec (reference `ldm/modules/diffusionmodules/model.py` +
  taming quantizer), key root ``first_stage_model.`` (or bare for vq-f4.ckpt),
* the cond-stage SpatialRescaler 1x1 conv.

Weight layout conversions: conv OIHW -> HWIO, 1x1/conv1d -> dense-like transposes,
norm weight/bias -> scale/bias. Orbax directories pass through unchanged.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import numpy as np


def load_torch_state_dict(path: str | Path) -> dict[str, np.ndarray]:
    import torch

    try:
        sd = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        sd = torch.load(path, map_location="cpu", weights_only=False)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items() if hasattr(v, "shape")}


def _conv_w(w: np.ndarray) -> np.ndarray:
    """OIHW -> HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def _dense_w(w: np.ndarray) -> np.ndarray:
    """[out, in] -> [in, out]."""
    return np.transpose(w)


def _conv1d_w(w: np.ndarray) -> np.ndarray:
    """[out, in, 1] -> [in, out] (our attention qkv/proj are Dense)."""
    return np.transpose(w[:, :, 0])


def _set(tree: dict, path: str, value: np.ndarray) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def _resblock_entries(prefix_t: str, prefix_j: str, sd: dict, out: dict) -> None:
    """Map one torch ResBlock (openaimodel.py:176-288) to our ResBlock names."""
    m = {
        "in_layers.0.weight": ("in_norm/norm/scale", None),
        "in_layers.0.bias": ("in_norm/norm/bias", None),
        "in_layers.2.weight": ("in_conv/kernel", _conv_w),
        "in_layers.2.bias": ("in_conv/bias", None),
        "emb_layers.1.weight": ("emb/kernel", _dense_w),
        "emb_layers.1.bias": ("emb/bias", None),
        "out_layers.0.weight": ("out_norm/norm/scale", None),
        "out_layers.0.bias": ("out_norm/norm/bias", None),
        "out_layers.3.weight": ("out_conv/kernel", _conv_w),
        "out_layers.3.bias": ("out_conv/bias", None),
        "skip_connection.weight": ("skip/kernel", _conv_w),
        "skip_connection.bias": ("skip/bias", None),
    }
    for tkey, (jkey, fn) in m.items():
        full = prefix_t + tkey
        if full in sd:
            v = sd[full]
            _set(out, f"{prefix_j}/{jkey}", fn(v) if fn else v)


def _attnblock_entries(prefix_t: str, prefix_j: str, sd: dict, out: dict) -> None:
    """Map one torch AttentionBlock (openaimodel.py:300-346)."""
    m = {
        "norm.weight": ("norm/norm/scale", None),
        "norm.bias": ("norm/norm/bias", None),
        "qkv.weight": ("qkv/kernel", _conv1d_w),
        "qkv.bias": ("qkv/bias", None),
        "proj_out.weight": ("proj_out/kernel", _conv1d_w),
        "proj_out.bias": ("proj_out/bias", None),
    }
    for tkey, (jkey, fn) in m.items():
        full = prefix_t + tkey
        if full in sd:
            v = sd[full]
            _set(out, f"{prefix_j}/{jkey}", fn(v) if fn else v)


def map_unet(sd: dict[str, np.ndarray], root: str = "model.diffusion_model.") -> dict:
    """Map the torch U-Net state_dict to our UNet param tree (nested dict)."""
    sd = {k[len(root):]: v for k, v in sd.items() if k.startswith(root)}
    out: dict = {}
    # time embed MLP
    for i in (0, 2):
        if f"time_embed.{i}.weight" in sd:
            _set(out, f"time_embed_{i}/kernel", _dense_w(sd[f"time_embed.{i}.weight"]))
            _set(out, f"time_embed_{i}/bias", sd[f"time_embed.{i}.bias"])
    # conv-in
    if "input_blocks.0.0.weight" in sd:
        _set(out, "input_blocks_0_0/kernel", _conv_w(sd["input_blocks.0.0.weight"]))
        _set(out, "input_blocks_0_0/bias", sd["input_blocks.0.0.bias"])
    # encoder blocks: ResBlocks at .0, downsample convs at .0.op
    idx = 1
    while any(k.startswith(f"input_blocks.{idx}.") for k in sd):
        if f"input_blocks.{idx}.0.op.weight" in sd:  # Downsample
            _set(out, f"input_blocks_{idx}_0/op/kernel",
                 _conv_w(sd[f"input_blocks.{idx}.0.op.weight"]))
            _set(out, f"input_blocks_{idx}_0/op/bias",
                 sd[f"input_blocks.{idx}.0.op.bias"])
        else:
            _resblock_entries(f"input_blocks.{idx}.0.", f"input_blocks_{idx}_0", sd, out)
        idx += 1
    # middle: ResBlock, ResBlockStyle (nested .block.), Attention, ResBlock
    _resblock_entries("middle_block.0.", "middle_block_0", sd, out)
    _resblock_entries("middle_block.1.block.", "middle_block_1", sd, out)
    _attnblock_entries("middle_block.2.", "middle_block_2", sd, out)
    _resblock_entries("middle_block.3.", "middle_block_3", sd, out)
    # decoder blocks: ResBlock at .0, Upsample conv at .1 (last block per level)
    idx = 0
    while any(k.startswith(f"output_blocks.{idx}.") for k in sd):
        _resblock_entries(f"output_blocks.{idx}.0.", f"output_blocks_{idx}_0", sd, out)
        if f"output_blocks.{idx}.1.conv.weight" in sd:
            _set(out, f"output_blocks_{idx}_up/conv/kernel",
                 _conv_w(sd[f"output_blocks.{idx}.1.conv.weight"]))
            _set(out, f"output_blocks_{idx}_up/conv/bias",
                 sd[f"output_blocks.{idx}.1.conv.bias"])
        idx += 1
    # output head
    if "out.0.weight" in sd:
        _set(out, "out_norm/norm/scale", sd["out.0.weight"])
        _set(out, "out_norm/norm/bias", sd["out.0.bias"])
        _set(out, "out_conv/kernel", _conv_w(sd["out.2.weight"]))
        _set(out, "out_conv/bias", sd["out.2.bias"])
    return out


def _vq_resnet(prefix_t: str, prefix_j: str, sd: dict, out: dict) -> None:
    m = {
        "norm1.weight": ("norm1/norm/scale", None),
        "norm1.bias": ("norm1/norm/bias", None),
        "conv1.weight": ("conv1/kernel", _conv_w),
        "conv1.bias": ("conv1/bias", None),
        "norm2.weight": ("norm2/norm/scale", None),
        "norm2.bias": ("norm2/norm/bias", None),
        "conv2.weight": ("conv2/kernel", _conv_w),
        "conv2.bias": ("conv2/bias", None),
        "nin_shortcut.weight": ("nin_shortcut/kernel", _conv_w),
        "nin_shortcut.bias": ("nin_shortcut/bias", None),
    }
    for tkey, (jkey, fn) in m.items():
        full = prefix_t + tkey
        if full in sd:
            v = sd[full]
            _set(out, f"{prefix_j}/{jkey}", fn(v) if fn else v)


def _vq_attn(prefix_t: str, prefix_j: str, sd: dict, out: dict) -> None:
    for name in ("q", "k", "v", "proj_out"):
        if f"{prefix_t}{name}.weight" in sd:
            _set(out, f"{prefix_j}/{name}/kernel", _conv_w(sd[f"{prefix_t}{name}.weight"]))
            _set(out, f"{prefix_j}/{name}/bias", sd[f"{prefix_t}{name}.bias"])
    if f"{prefix_t}norm.weight" in sd:
        _set(out, f"{prefix_j}/norm/norm/scale", sd[f"{prefix_t}norm.weight"])
        _set(out, f"{prefix_j}/norm/norm/bias", sd[f"{prefix_t}norm.bias"])


def map_vq(sd: dict[str, np.ndarray], root: str = "") -> dict:
    """Map a VQModel state_dict (taming lineage) to our VQModelInterface tree.
    Accepts both bare vq-f4.ckpt keys and ``first_stage_model.``-rooted keys."""
    if root:
        sd = {k[len(root):]: v for k, v in sd.items() if k.startswith(root)}
    out: dict = {}
    for side in ("encoder", "decoder"):
        pre = f"{side}."
        if f"{pre}conv_in.weight" in sd:
            _set(out, f"{side}/conv_in/kernel", _conv_w(sd[f"{pre}conv_in.weight"]))
            _set(out, f"{side}/conv_in/bias", sd[f"{pre}conv_in.bias"])
            _set(out, f"{side}/norm_out/norm/scale", sd[f"{pre}norm_out.weight"])
            _set(out, f"{side}/norm_out/norm/bias", sd[f"{pre}norm_out.bias"])
            _set(out, f"{side}/conv_out/kernel", _conv_w(sd[f"{pre}conv_out.weight"]))
            _set(out, f"{side}/conv_out/bias", sd[f"{pre}conv_out.bias"])
            for mid in ("block_1", "block_2"):
                _vq_resnet(f"{pre}mid.{mid}.", f"{side}/mid_{mid}", sd, out)
            _vq_attn(f"{pre}mid.attn_1.", f"{side}/mid_attn_1", sd, out)
    # encoder down / decoder up level blocks
    for lvl in range(16):
        for blk in range(8):
            _vq_resnet(f"encoder.down.{lvl}.block.{blk}.",
                       f"encoder/down_{lvl}_block_{blk}", sd, out)
            _vq_resnet(f"decoder.up.{lvl}.block.{blk}.",
                       f"decoder/up_{lvl}_block_{blk}", sd, out)
        if f"encoder.down.{lvl}.downsample.conv.weight" in sd:
            _set(out, f"encoder/down_{lvl}_downsample/conv/kernel",
                 _conv_w(sd[f"encoder.down.{lvl}.downsample.conv.weight"]))
            _set(out, f"encoder/down_{lvl}_downsample/conv/bias",
                 sd[f"encoder.down.{lvl}.downsample.conv.bias"])
        if f"decoder.up.{lvl}.upsample.conv.weight" in sd:
            _set(out, f"decoder/up_{lvl}_upsample/conv/kernel",
                 _conv_w(sd[f"decoder.up.{lvl}.upsample.conv.weight"]))
            _set(out, f"decoder/up_{lvl}_upsample/conv/bias",
                 sd[f"decoder.up.{lvl}.upsample.conv.bias"])
    if "quantize.embedding.weight" in sd:
        _set(out, "quantize/embedding", sd["quantize.embedding.weight"])
    for qc in ("quant_conv", "post_quant_conv"):
        if f"{qc}.weight" in sd:
            _set(out, f"{qc}/kernel", _conv_w(sd[f"{qc}.weight"]))
            _set(out, f"{qc}/bias", sd[f"{qc}.bias"])
    return out


def _plain_conv(prefix_t: str, prefix_j: str, sd: dict, out: dict) -> None:
    if f"{prefix_t}weight" in sd:
        _set(out, f"{prefix_j}/kernel", _conv_w(sd[f"{prefix_t}weight"]))
        _set(out, f"{prefix_j}/bias", sd[f"{prefix_t}bias"])


def _gn_entries(prefix_t: str, prefix_j: str, sd: dict, out: dict) -> None:
    if f"{prefix_t}weight" in sd:
        _set(out, f"{prefix_j}/norm/scale", sd[f"{prefix_t}weight"])
        _set(out, f"{prefix_j}/norm/bias", sd[f"{prefix_t}bias"])


def map_simple_decoder(sd: dict[str, np.ndarray], root: str = "") -> dict:
    """`SimpleDecoder` (reference model.py:571-604) -> models/aux_decoders.py."""
    if root:
        sd = {k[len(root):]: v for k, v in sd.items() if k.startswith(root)}
    out: dict = {}
    for i in (0, 4):
        _plain_conv(f"model.{i}.", f"model_{i}", sd, out)
    for i in (1, 2, 3):
        _vq_resnet(f"model.{i}.", f"model_{i}", sd, out)
    _plain_conv("model.5.conv.", "model_5/conv", sd, out)
    _gn_entries("norm_out.", "norm_out", sd, out)
    _plain_conv("conv_out.", "conv_out", sd, out)
    return out


def map_upsample_decoder(sd: dict[str, np.ndarray], root: str = "") -> dict:
    """`UpsampleDecoder` (reference model.py:607-652)."""
    if root:
        sd = {k[len(root):]: v for k, v in sd.items() if k.startswith(root)}
    out: dict = {}
    for lvl in range(16):
        for blk in range(8):
            _vq_resnet(f"res_blocks.{lvl}.{blk}.", f"res_{lvl}_{blk}", sd, out)
        _plain_conv(f"upsample_blocks.{lvl}.conv.", f"upsample_{lvl}/conv",
                    sd, out)
    _gn_entries("norm_out.", "norm_out", sd, out)
    _plain_conv("conv_out.", "conv_out", sd, out)
    return out


def map_latent_rescaler(sd: dict[str, np.ndarray], root: str = "") -> dict:
    """`LatentRescaler` (reference model.py:655-689)."""
    if root:
        sd = {k[len(root):]: v for k, v in sd.items() if k.startswith(root)}
    out: dict = {}
    _plain_conv("conv_in.", "conv_in", sd, out)
    for i in range(16):
        _vq_resnet(f"res_block1.{i}.", f"res1_{i}", sd, out)
        _vq_resnet(f"res_block2.{i}.", f"res2_{i}", sd, out)
    _vq_attn("attn.", "attn", sd, out)
    _plain_conv("conv_out.", "conv_out", sd, out)
    return out


def map_merged_rescale_encoder(sd: dict[str, np.ndarray], root: str = "") -> dict:
    """`MergedRescaleEncoder` (reference model.py:692-708): full codec Encoder
    keys ride `map_vq`'s ``encoder.`` handling; the rescaler nests alongside."""
    if root:
        sd = {k[len(root):]: v for k, v in sd.items() if k.startswith(root)}
    out = map_vq(sd)
    out["rescaler"] = map_latent_rescaler(sd, root="rescaler.")
    return out


def map_merged_rescale_decoder(sd: dict[str, np.ndarray], root: str = "") -> dict:
    """`MergedRescaleDecoder` (model.py:711-725) and `Upsampler` (:728-744) —
    both are `rescaler.` + `decoder.` trees."""
    if root:
        sd = {k[len(root):]: v for k, v in sd.items() if k.startswith(root)}
    out = map_vq(sd)
    out["rescaler"] = map_latent_rescaler(sd, root="rescaler.")
    return out


def map_first_stage_post(sd: dict[str, np.ndarray], root: str = "") -> dict:
    """`FirstStagePostProcessor` (model.py:770-834). The torch blocks carry
    unused `temb_proj` params (ResnetBlock default temb_channels=512 with
    temb=None at forward) — skipped, as is the param-free `downsampler`."""
    if root:
        sd = {k[len(root):]: v for k, v in sd.items() if k.startswith(root)}
    out: dict = {}
    _gn_entries("proj_norm.", "proj_norm", sd, out)
    _plain_conv("proj.", "proj", sd, out)
    for i in range(16):
        _vq_resnet(f"model.{i}.", f"model_{i}", sd, out)
    return out


def map_cond_stage(sd: dict[str, np.ndarray]) -> dict:
    out: dict = {}
    key = "cond_stage_model.channel_mapper.weight"
    if key in sd:
        _set(out, "channel_mapper/kernel", _conv_w(sd[key]))
    return out


def map_xtransformer(sd: dict[str, np.ndarray], depth: int,
                     root: str = "transformer.") -> dict:
    """Map the reference's lucidrains-fork ``TransformerWrapper`` state_dict
    (ldm/modules/x_transformer.py:548-640 at the embedder defaults — the layer
    list interleaves attention at even and feedforward at odd indices,
    :451,:475-479) to our `stedm_tpu/models/text_embedders.py:
    TransformerWrapper` tree."""
    out: dict = {}
    fixed = {
        "token_emb.weight": ("token_emb/embedding", None),
        "pos_emb.emb.weight": ("pos_emb/embedding", None),
        "norm.weight": ("norm/scale", None),
        "norm.bias": ("norm/bias", None),
        "to_logits.weight": ("to_logits/kernel", _dense_w),
        "to_logits.bias": ("to_logits/bias", None),
    }
    per_layer = [
        # (torch suffix under layers.{2i or 2i+1}., our name, transform)
        ("0.weight", "attn_norm_{i}/scale", None, 0),
        ("0.bias", "attn_norm_{i}/bias", None, 0),
        ("1.to_q.weight", "attn_{i}/to_q/kernel", _dense_w, 0),
        ("1.to_k.weight", "attn_{i}/to_k/kernel", _dense_w, 0),
        ("1.to_v.weight", "attn_{i}/to_v/kernel", _dense_w, 0),
        ("1.to_out.weight", "attn_{i}/to_out/kernel", _dense_w, 0),
        ("1.to_out.bias", "attn_{i}/to_out/bias", None, 0),
        ("0.weight", "ff_norm_{i}/scale", None, 1),
        ("0.bias", "ff_norm_{i}/bias", None, 1),
        ("1.net.0.0.weight", "ff_{i}/ff_in/kernel", _dense_w, 1),
        ("1.net.0.0.bias", "ff_{i}/ff_in/bias", None, 1),
        ("1.net.2.weight", "ff_{i}/ff_out/kernel", _dense_w, 1),
        ("1.net.2.bias", "ff_{i}/ff_out/bias", None, 1),
    ]
    for tkey, (jkey, fn) in fixed.items():
        full = root + tkey
        if full in sd:
            v = sd[full]
            _set(out, jkey, fn(v) if fn else v)
    for i in range(depth):
        for suffix, jtpl, fn, odd in per_layer:
            full = f"{root}attn_layers.layers.{2 * i + odd}.{suffix}"
            if full in sd:
                v = sd[full]
                _set(out, jtpl.format(i=i), fn(v) if fn else v)
    return out


def map_encoder_unet(sd: dict[str, np.ndarray], root: str = "") -> dict:
    """Map a torch ``EncoderUNetModel`` state_dict (the half-U-Net classifier,
    reference openaimodel.py:809-1024) to our
    `stedm_tpu/models/encoder_unet.py:EncoderUNetModel` tree. The trunk reuses
    the U-Net block mappers; the head is dispatched on the ``out.*`` keys
    (adaptive / attention / spatial / spatial_v2)."""
    if root:
        sd = {k[len(root):]: v for k, v in sd.items() if k.startswith(root)}
    out: dict = {}
    for i in (0, 2):
        if f"time_embed.{i}.weight" in sd:
            _set(out, f"time_embed_{i}/kernel", _dense_w(sd[f"time_embed.{i}.weight"]))
            _set(out, f"time_embed_{i}/bias", sd[f"time_embed.{i}.bias"])
    if "input_blocks.0.0.weight" in sd:
        _set(out, "input_blocks_0_0/kernel", _conv_w(sd["input_blocks.0.0.weight"]))
        _set(out, "input_blocks_0_0/bias", sd["input_blocks.0.0.bias"])
    idx = 1
    while any(k.startswith(f"input_blocks.{idx}.") for k in sd):
        if f"input_blocks.{idx}.0.op.weight" in sd:  # Downsample
            _set(out, f"input_blocks_{idx}_0/op/kernel",
                 _conv_w(sd[f"input_blocks.{idx}.0.op.weight"]))
            _set(out, f"input_blocks_{idx}_0/op/bias",
                 sd[f"input_blocks.{idx}.0.op.bias"])
        else:
            _resblock_entries(f"input_blocks.{idx}.0.", f"input_blocks_{idx}_0", sd, out)
        _attnblock_entries(f"input_blocks.{idx}.1.", f"input_blocks_{idx}_1", sd, out)
        idx += 1
    # middle: ResBlock, Attention, ResBlock (no style block in the classifier)
    _resblock_entries("middle_block.0.", "middle_block_0", sd, out)
    _attnblock_entries("middle_block.1.", "middle_block_1", sd, out)
    _resblock_entries("middle_block.2.", "middle_block_2", sd, out)
    # pooled head
    if "out.2.qkv_proj.weight" in sd:  # attention
        _set(out, "out_norm/norm/scale", sd["out.0.weight"])
        _set(out, "out_norm/norm/bias", sd["out.0.bias"])
        _set(out, "attn_pool/positional_embedding",
             _dense_w(sd["out.2.positional_embedding"]))
        _set(out, "attn_pool/qkv_proj/kernel", _conv1d_w(sd["out.2.qkv_proj.weight"]))
        _set(out, "attn_pool/qkv_proj/bias", sd["out.2.qkv_proj.bias"])
        _set(out, "attn_pool/c_proj/kernel", _conv1d_w(sd["out.2.c_proj.weight"]))
        _set(out, "attn_pool/c_proj/bias", sd["out.2.c_proj.bias"])
    elif "out.0.weight" in sd and sd["out.0.weight"].ndim == 1:  # adaptive
        _set(out, "out_norm/norm/scale", sd["out.0.weight"])
        _set(out, "out_norm/norm/bias", sd["out.0.bias"])
        _set(out, "out_conv/kernel", _dense_w(sd["out.3.weight"][:, :, 0, 0]))
        _set(out, "out_conv/bias", sd["out.3.bias"])
    elif "out.1.weight" in sd:  # spatial_v2: Linear, GN32, SiLU, Linear
        _set(out, "out_0/kernel", _dense_w(sd["out.0.weight"]))
        _set(out, "out_0/bias", sd["out.0.bias"])
        _set(out, "out_norm/norm/scale", sd["out.1.weight"])
        _set(out, "out_norm/norm/bias", sd["out.1.bias"])
        _set(out, "out_3/kernel", _dense_w(sd["out.3.weight"]))
        _set(out, "out_3/bias", sd["out.3.bias"])
    elif "out.0.weight" in sd:  # spatial: Linear, ReLU, Linear
        _set(out, "out_0/kernel", _dense_w(sd["out.0.weight"]))
        _set(out, "out_0/bias", sd["out.0.bias"])
        _set(out, "out_3/kernel", _dense_w(sd["out.2.weight"]))
        _set(out, "out_3/bias", sd["out.2.bias"])
    return out


def map_full_ldm(sd: dict[str, np.ndarray]) -> dict:
    """Map a full reference LDM_Diffusion/S_ZSS_DM checkpoint into our STEDM tree
    (unet / first_stage / cond_stage). The style branch (agg/swin) is torchvision-
    random-initialized in the reference and is not mapped."""
    # entry-point checkpoints prefix everything with "model." (LDM_Diffusion
    # registers S_ZSS_DM as "model", modules/ldm_diffusion.py:41)
    if any(k.startswith("model.model.diffusion_model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items() if k.startswith("model.")}
    out: dict = {}
    out["unet"] = map_unet(sd)
    out["first_stage"] = map_vq(sd, root="first_stage_model.")
    cond = map_cond_stage(sd)
    if cond:
        out["cond_stage"] = cond
    return out


def map_mit_b2(sd: dict[str, np.ndarray], root: str = "") -> dict:
    """Map a Mix-Transformer (SegFormer MiT) encoder state_dict to our
    `stedm_tpu/models/segformer.py:MiTEncoder` tree.

    Accepts the official NVlabs layout (``patch_embed1.proj...``, ``block1.0...``,
    ``norm1...``) which is also what segmentation_models_pytorch wraps for
    ``encoder_weights="imagenet"`` (reference modules/segmentation.py:41); pass
    ``root="_model.encoder."`` for a Lightning Segmentation checkpoint or
    ``root="encoder."`` for a bare smp.Unet state_dict. The fused ``attn.kv``
    matrix is split into our separate k/v Dense kernels; the classification
    ``head.*`` is ignored (smp drops it too).
    """
    if root:
        sd = {k[len(root):]: v for k, v in sd.items() if k.startswith(root)}
    out: dict = {}
    for s in range(4):
        t = s + 1
        if f"patch_embed{t}.proj.weight" not in sd:
            continue
        _set(out, f"patch_embed_{s}/kernel", _conv_w(sd[f"patch_embed{t}.proj.weight"]))
        _set(out, f"patch_embed_{s}/bias", sd[f"patch_embed{t}.proj.bias"])
        _set(out, f"embed_norm_{s}/scale", sd[f"patch_embed{t}.norm.weight"])
        _set(out, f"embed_norm_{s}/bias", sd[f"patch_embed{t}.norm.bias"])
        _set(out, f"stage_norm_{s}/scale", sd[f"norm{t}.weight"])
        _set(out, f"stage_norm_{s}/bias", sd[f"norm{t}.bias"])
        i = 0
        while f"block{t}.{i}.norm1.weight" in sd:
            bt, bj = f"block{t}.{i}.", f"stage{s}_block{i}"
            for norm in ("norm1", "norm2"):
                _set(out, f"{bj}/{norm}/scale", sd[f"{bt}{norm}.weight"])
                _set(out, f"{bj}/{norm}/bias", sd[f"{bt}{norm}.bias"])
            _set(out, f"{bj}/attn/q/kernel", _dense_w(sd[f"{bt}attn.q.weight"]))
            _set(out, f"{bj}/attn/q/bias", sd[f"{bt}attn.q.bias"])
            kv_w, kv_b = sd[f"{bt}attn.kv.weight"], sd[f"{bt}attn.kv.bias"]
            c = kv_w.shape[0] // 2
            _set(out, f"{bj}/attn/k/kernel", _dense_w(kv_w[:c]))
            _set(out, f"{bj}/attn/k/bias", kv_b[:c])
            _set(out, f"{bj}/attn/v/kernel", _dense_w(kv_w[c:]))
            _set(out, f"{bj}/attn/v/bias", kv_b[c:])
            _set(out, f"{bj}/attn/proj/kernel", _dense_w(sd[f"{bt}attn.proj.weight"]))
            _set(out, f"{bj}/attn/proj/bias", sd[f"{bt}attn.proj.bias"])
            if f"{bt}attn.sr.weight" in sd:  # sr_ratio > 1 stages only
                _set(out, f"{bj}/attn/sr/kernel", _conv_w(sd[f"{bt}attn.sr.weight"]))
                _set(out, f"{bj}/attn/sr/bias", sd[f"{bt}attn.sr.bias"])
                _set(out, f"{bj}/attn/sr_norm/scale", sd[f"{bt}attn.norm.weight"])
                _set(out, f"{bj}/attn/sr_norm/bias", sd[f"{bt}attn.norm.bias"])
            _set(out, f"{bj}/ffn/fc1/kernel", _dense_w(sd[f"{bt}mlp.fc1.weight"]))
            _set(out, f"{bj}/ffn/fc1/bias", sd[f"{bt}mlp.fc1.bias"])
            _set(out, f"{bj}/ffn/dwconv/kernel",
                 _conv_w(sd[f"{bt}mlp.dwconv.dwconv.weight"]))
            _set(out, f"{bj}/ffn/dwconv/bias", sd[f"{bt}mlp.dwconv.dwconv.bias"])
            _set(out, f"{bj}/ffn/fc2/kernel", _dense_w(sd[f"{bt}mlp.fc2.weight"]))
            _set(out, f"{bj}/ffn/fc2/bias", sd[f"{bt}mlp.fc2.bias"])
            i += 1
    return out


def map_swin_v2(sd: dict[str, np.ndarray], root: str = "") -> dict:
    """Map a torchvision ``swin_v2_*`` state_dict to our
    `stedm_tpu/models/swin.py:SwinV2` tree (SURVEY §7 hard part (d); the reference
    instantiates torchvision swin_v2_t with RANDOM init, s_zss_dm.py:19-20, so this
    importer is for checkpoints of trained reference runs or torchvision weights).

    torchvision layout: ``features.0.{0=conv,2=LN}`` patch embed; stage ``s``
    blocks at ``features.{2s+1}.{i}.*``; PatchMergingV2 at ``features.{2s+2}.*``;
    final ``norm`` + ``head`` (the reference replaces head with Linear(768, 512)).
    Buffers (relative_coords_table / relative_position_index) are recomputed on
    the fly in our model and skipped here.
    """
    if root:
        sd = {k[len(root):]: v for k, v in sd.items() if k.startswith(root)}
    out: dict = {}
    if "features.0.0.weight" in sd:
        _set(out, "patch_embed/kernel", _conv_w(sd["features.0.0.weight"]))
        _set(out, "patch_embed/bias", sd["features.0.0.bias"])
        _set(out, "patch_norm/scale", sd["features.0.2.weight"])
        _set(out, "patch_norm/bias", sd["features.0.2.bias"])
    for s in range(4):
        f = 2 * s + 1
        i = 0
        while f"features.{f}.{i}.norm1.weight" in sd:
            bt, bj = f"features.{f}.{i}.", f"stage{s}_block{i}"
            for norm in ("norm1", "norm2"):
                _set(out, f"{bj}/{norm}/scale", sd[f"{bt}{norm}.weight"])
                _set(out, f"{bj}/{norm}/bias", sd[f"{bt}{norm}.bias"])
            _set(out, f"{bj}/attn/qkv/kernel", _dense_w(sd[f"{bt}attn.qkv.weight"]))
            _set(out, f"{bj}/attn/qkv/bias", sd[f"{bt}attn.qkv.bias"])
            _set(out, f"{bj}/attn/proj/kernel", _dense_w(sd[f"{bt}attn.proj.weight"]))
            _set(out, f"{bj}/attn/proj/bias", sd[f"{bt}attn.proj.bias"])
            _set(out, f"{bj}/attn/logit_scale", sd[f"{bt}attn.logit_scale"])
            _set(out, f"{bj}/attn/cpb_mlp_0/kernel",
                 _dense_w(sd[f"{bt}attn.cpb_mlp.0.weight"]))
            _set(out, f"{bj}/attn/cpb_mlp_0/bias", sd[f"{bt}attn.cpb_mlp.0.bias"])
            _set(out, f"{bj}/attn/cpb_mlp_2/kernel",
                 _dense_w(sd[f"{bt}attn.cpb_mlp.2.weight"]))
            _set(out, f"{bj}/mlp_fc1/kernel", _dense_w(sd[f"{bt}mlp.0.weight"]))
            _set(out, f"{bj}/mlp_fc1/bias", sd[f"{bt}mlp.0.bias"])
            _set(out, f"{bj}/mlp_fc2/kernel", _dense_w(sd[f"{bt}mlp.3.weight"]))
            _set(out, f"{bj}/mlp_fc2/bias", sd[f"{bt}mlp.3.bias"])
            i += 1
        m = 2 * s + 2
        if f"features.{m}.reduction.weight" in sd:
            _set(out, f"merge{s}/reduction/kernel",
                 _dense_w(sd[f"features.{m}.reduction.weight"]))
            _set(out, f"merge{s}/norm/scale", sd[f"features.{m}.norm.weight"])
            _set(out, f"merge{s}/norm/bias", sd[f"features.{m}.norm.bias"])
    if "norm.weight" in sd:
        _set(out, "norm/scale", sd["norm.weight"])
        _set(out, "norm/bias", sd["norm.bias"])
    if "head.weight" in sd:
        _set(out, "head/kernel", _dense_w(sd["head.weight"]))
        _set(out, "head/bias", sd["head.bias"])
    return out


def map_inception(sd: dict[str, np.ndarray], eps: float = 1e-3) -> dict:
    """Map a torchvision/pytorch-fid InceptionV3 state_dict to our
    `stedm_tpu/models/inception.py:InceptionV3FID` tree, folding each
    BasicConv2d's BatchNorm (eps 0.001) into the conv kernel + a bias:
    ``w' = w * g/sqrt(var+eps)``, ``b' = beta - mean * g/sqrt(var+eps)``.
    Classifier (`fc.*`) and aux-head keys are ignored."""
    out: dict = {}
    for key in sd:
        if not key.endswith(".conv.weight") or key.startswith("AuxLogits"):
            continue
        base = key[:-len(".conv.weight")]
        w = sd[key]                                   # OIHW
        g = sd[f"{base}.bn.weight"]
        beta = sd[f"{base}.bn.bias"]
        mean = sd[f"{base}.bn.running_mean"]
        var = sd[f"{base}.bn.running_var"]
        scale = g / np.sqrt(var + eps)
        name = base.replace(".", "_")
        _set(out, f"{name}/kernel", _conv_w(w * scale[:, None, None, None]))
        _set(out, f"{name}/bias", beta - mean * scale)
    return out


_VGG_SLICE_BOUNDS = (4, 9, 16, 23, 30)  # taming lpips.py vgg16 slice ends


def map_lpips(sd: dict[str, np.ndarray]) -> dict:
    """Map LPIPS weights to `stedm_tpu/models/lpips.py:LPIPS`.

    Accepts (any mix, any of these roots: "", "perceptual_loss.",
    "loss.perceptual_loss."):
    * taming's ``vgg.pth`` ("vgg_lpips"): ``lin{k}.model.1.weight`` heads
      (scaling-layer buffers are hardcoded in our module and skipped),
    * a full taming ``LPIPS`` state_dict: ``net.slice{s}.{i}.weight/bias``,
    * a bare torchvision VGG16: ``features.{i}.weight/bias`` (classifier keys
      ignored), sliced at the max-pool boundaries 4/9/16/23/30.
    Call once per source file and `merge_loaded` each result.
    """
    out: dict = {}
    for key, v in sd.items():
        k = key
        for root in ("loss.perceptual_loss.", "perceptual_loss."):
            if k.startswith(root):
                k = k[len(root):]
        parts = k.split(".")
        if parts[0].startswith("lin") and parts[-1] == "weight" and \
                parts[1:3] == ["model", "1"]:
            _set(out, f"{parts[0]}_model_1/kernel", _conv_w(v))
        elif parts[0] == "net" and parts[-1] in ("weight", "bias"):
            name = f"net/net_{parts[1]}_{parts[2]}"
            _set(out, f"{name}/{'kernel' if parts[-1] == 'weight' else 'bias'}",
                 _conv_w(v) if parts[-1] == "weight" else v)
        elif parts[0] == "features" and parts[-1] in ("weight", "bias"):
            idx = int(parts[1])
            s = next(i for i, end in enumerate(_VGG_SLICE_BOUNDS)
                     if idx < end) + 1
            _set(out, f"net/net_slice{s}_{idx}/"
                      f"{'kernel' if parts[-1] == 'weight' else 'bias'}",
                 _conv_w(v) if parts[-1] == "weight" else v)
    return out


def map_discriminator(sd: dict[str, np.ndarray]) -> tuple[dict, dict]:
    """Map a taming ``NLayerDiscriminator`` state_dict (keys ``main.{i}.*``,
    optionally under ``discriminator.`` / ``loss.discriminator.``) to
    `stedm_tpu/models/discriminator.py` — returns ``(params, batch_stats)``
    (BatchNorm running stats live in a separate flax collection)."""
    params: dict = {}
    stats: dict = {}
    for key, v in sd.items():
        k = key
        for root in ("loss.discriminator.", "discriminator."):
            if k.startswith(root):
                k = k[len(root):]
        parts = k.split(".")
        if parts[0] != "main":
            continue
        name = f"main_{parts[1]}"
        leaf = parts[-1]
        if leaf == "weight":
            if v.ndim == 4:
                _set(params, f"{name}/kernel", _conv_w(v))
            else:  # BatchNorm / ActNorm scale
                _set(params, f"{name}/scale", v.reshape(-1))
        elif leaf == "bias":
            _set(params, f"{name}/bias", v.reshape(-1))
        elif leaf == "running_mean":
            _set(stats, f"{name}/mean", v)
        elif leaf == "running_var":
            _set(stats, f"{name}/var", v)
        elif leaf in ("loc", "scale"):  # taming ActNorm [1, C, 1, 1]
            _set(params, f"{name}/{leaf}", v.reshape(-1))
    return params, stats


def load_seg_encoder(params: Any, path: str) -> Any:
    """Load pretrained MiT-B2 weights into a SegUNet param tree's ``encoder``
    subtree (reference `modules/segmentation.py:41` ``encoder_weights="imagenet"``).
    Auto-detects the key root (bare NVlabs file, smp.Unet, or Lightning ckpt)."""
    p = Path(path)
    if p.is_dir():
        from stedm_tpu.train import checkpoints

        return checkpoints.restore_params(p, params)
    sd = load_torch_state_dict(p)
    root = ""
    for cand in ("_model.encoder.", "model.encoder.", "encoder."):
        if any(k.startswith(cand + "patch_embed1.") for k in sd):
            root = cand
            break
    loaded = {"encoder": map_mit_b2(sd, root=root)}
    return merge_loaded(params, loaded)


def merge_loaded(params: Any, loaded: dict, *, subtree: str | None = None,
                 ignore_keys: list[str] = ()) -> Any:
    """Overlay ``loaded`` (nested dict of arrays) onto ``params`` where paths and
    shapes match; everything else keeps its initialized value (the non-strict /
    filtered load of reference ddpm.py:189-205)."""
    import jax

    def path_str(path) -> str:
        return "/".join(str(getattr(k, "key", k)) for k in path)

    flat = {path_str(p): v
            for p, v in jax.tree_util.tree_flatten_with_path(loaded)[0]}
    stats = {"loaded": 0, "skipped": 0}

    def merge(path, leaf):
        name = path_str(path)
        lookup = name if subtree is None else \
            (name[len(subtree) + 1:] if name.startswith(subtree + "/") else None)
        if lookup is None:
            return leaf
        if any(ik and ik in name for ik in ignore_keys):
            return leaf
        if lookup in flat and flat[lookup].shape == tuple(leaf.shape):
            stats["loaded"] += 1
            return flat[lookup].astype(leaf.dtype)
        stats["skipped"] += 1
        return leaf

    merged = jax.tree_util.tree_map_with_path(merge, params)
    print(f"[torch_import] merged {stats['loaded']} tensors "
          f"({stats['skipped']} left at init)")
    return merged


def load_into_params(params: Any, path: str, *, subtree: str | None = None,
                     ignore_keys: list[str] = ()) -> Any:
    """Load a checkpoint file into a param tree.

    Torch ``.ckpt``/``.pt`` files are key-mapped; directories are treated as orbax
    checkpoints of the same tree (restored strictly).
    """
    p = Path(path)
    if p.is_dir():
        from stedm_tpu.train import checkpoints

        return checkpoints.restore_params(p, params)
    sd = load_torch_state_dict(p)
    if subtree == "first_stage":
        root = "first_stage_model." if any(
            k.startswith("first_stage_model.") for k in sd) else ""
        loaded = map_vq(sd, root=root)
    elif subtree == "unet":
        root = "model.diffusion_model." if any(
            k.startswith("model.diffusion_model.") for k in sd) else \
            "model.model.diffusion_model."
        loaded = map_unet(sd, root=root)
    else:
        loaded = map_full_ldm(sd)
    return merge_loaded(params, loaded, subtree=subtree, ignore_keys=ignore_keys)
