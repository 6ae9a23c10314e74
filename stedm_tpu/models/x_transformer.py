"""Full x_transformer port: every branch of the reference's bundled copy.

Counterpart of `/root/reference/ldm/modules/x_transformer.py:1-641` (dead on
the reference's active path; its shipped-default subset lives in
:mod:`stedm_tpu.models.text_embedders` and stays the production path). This
module ports the REST of the surface (VERDICT r3 "what's missing" #2):

* positional modes — absolute learned, position-infused attention
  (shortformer `FixedPositionalEmbedding` with the k/q offset logic,
  x_transformer.py:39-51/291-296), or none. NOTE the bundled copy has NO
  rotary or relative-position implementation (`rel_pos` is hardwired None
  and `rotary_pos_emb = always(None)`, x_transformer.py:407-412) — those
  exist only in upstream lucidrains/x-transformers, so there is nothing to
  port for them.
* norms — LayerNorm / ScaleNorm / RMSNorm / Rezero (x_transformer.py:117-161,
  417-422), pre- and post-norm placement (:490-537).
* residuals — plain or GRU-gated (x_transformer.py:163-181, 469-472).
* layouts — default / cross_attend / only_cross / macaron (with the 0.5
  scale) / custom_layers / sandwich_coef / par_ratio (PAR paper layout)
  (x_transformer.py:436-460).
* attention knobs — talking heads, sparse top-k, memory key/values, attention
  -on-attention (GLU out), causal masks over memory-extended keys, residual
  attention (prev_attn accumulation, both self and cross)
  (x_transformer.py:215-368).
* wrapper — memory tokens, `mems` recurrence with `max_mem_len` truncation,
  tied embeddings, `emb_dim != dim` projection, return_embeddings /
  return_mems / return_attn (x_transformer.py:548-641).

`use_entmax15` raises NotImplementedError exactly as the reference does
(x_transformer.py:231-232). `import_x_transformer_torch` maps a reference
`TransformerWrapper.state_dict()` onto our param tree for parity audits.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_DIM_HEAD = 64


def fixed_pos_emb(n: int, dim: int, offset: int = 0) -> jnp.ndarray:
    """Sinusoidal embedding (reference FixedPositionalEmbedding, :39-51):
    [sin | cos] concatenated (NOT interleaved)."""
    inv_freq = 1.0 / (10000 ** (np.arange(0, dim, 2, dtype=np.float32) / dim))
    t = np.arange(n, dtype=np.float32) + offset
    sinusoid = np.einsum("i,j->ij", t, inv_freq)
    emb = np.concatenate([np.sin(sinusoid), np.cos(sinusoid)], axis=-1)
    return jnp.asarray(emb)[None]


class AbsolutePositionalEmbedding(nn.Module):
    dim: int
    max_seq_len: int

    @nn.compact
    def __call__(self, n: int) -> jnp.ndarray:
        emb = nn.Embed(self.max_seq_len, self.dim, name="emb",
                       embedding_init=nn.initializers.normal(0.02))
        return emb(jnp.arange(n))[None]


class ScaleNorm(nn.Module):
    """x / max(||x||_2 * dim^-0.5, eps) * g — single scalar gain (:139-148)."""
    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        g = self.param("g", nn.initializers.ones, (1,))
        norm = jnp.linalg.norm(x, axis=-1, keepdims=True) * self.dim ** -0.5
        return x / jnp.maximum(norm, self.eps) * g


class RMSNorm(nn.Module):
    """Like ScaleNorm but per-channel gain (:151-161)."""
    dim: int
    eps: float = 1e-8

    @nn.compact
    def __call__(self, x):
        g = self.param("g", nn.initializers.ones, (self.dim,))
        norm = jnp.linalg.norm(x, axis=-1, keepdims=True) * self.dim ** -0.5
        return x / jnp.maximum(norm, self.eps) * g


class GRUGating(nn.Module):
    """GRU-cell residual gate (:168-181): h'=GRUCell(input=x, hidden=residual).

    Parameters mirror torch.nn.GRUCell exactly (weight_ih/hh stacked [r;z;n])
    so the importer is a straight copy."""
    dim: int

    @nn.compact
    def __call__(self, x, residual):
        d = self.dim
        w_ih = self.param("weight_ih", nn.initializers.lecun_normal(), (3 * d, d))
        w_hh = self.param("weight_hh", nn.initializers.lecun_normal(), (3 * d, d))
        b_ih = self.param("bias_ih", nn.initializers.zeros, (3 * d,))
        b_hh = self.param("bias_hh", nn.initializers.zeros, (3 * d,))
        gi = x @ w_ih.T + b_ih
        gh = residual @ w_hh.T + b_hh
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        return (1.0 - z) * n + z * residual


class GEGLU(nn.Module):
    dim_out: int

    @nn.compact
    def __call__(self, x):
        x, gate = jnp.split(nn.Dense(self.dim_out * 2, name="proj")(x), 2, -1)
        return x * jax.nn.gelu(gate, approximate=False)  # torch GELU = erf


class FeedForward(nn.Module):
    """(:194-212). Torch key layout preserved: net.0(.0|.proj) / net.2."""
    dim: int
    dim_out: Optional[int] = None
    mult: int = 4
    glu: bool = False
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        inner = int(self.dim * self.mult)
        if self.glu:
            x = GEGLU(inner, name="net_0")(x)
        else:
            x = jax.nn.gelu(nn.Dense(inner, name="net_0")(x),
                            approximate=False)  # torch nn.GELU = erf
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return nn.Dense(self.dim_out or self.dim, name="net_2")(x)


class Attention(nn.Module):
    """Full attention with every reference knob (:215-368)."""
    dim: int
    dim_head: int = DEFAULT_DIM_HEAD
    heads: int = 8
    causal: bool = False
    talking_heads: bool = False
    sparse_topk: Optional[int] = None
    use_entmax15: bool = False
    num_mem_kv: int = 0
    dropout: float = 0.0
    on_attn: bool = False

    @nn.compact
    def __call__(self, x, context=None, mask=None, context_mask=None,
                 sinusoidal_emb: bool = False, prev_attn=None, mem=None,
                 deterministic: bool = True):
        if self.use_entmax15:
            raise NotImplementedError(
                "Check out entmax activation instead of softmax activation!")
        b, n, _ = x.shape
        h, scale = self.heads, self.dim_head ** -0.5
        inner = self.dim_head * h
        kv_input = context if context is not None else x
        q_input, k_input, v_input = x, kv_input, kv_input
        if mem is not None:
            k_input = jnp.concatenate([mem, k_input], axis=-2)
            v_input = jnp.concatenate([mem, v_input], axis=-2)
        if sinusoidal_emb:
            # shortformer: queries start at the offset of the cached memory
            offset = k_input.shape[-2] - q_input.shape[-2]
            q_input = q_input + fixed_pos_emb(q_input.shape[1], self.dim, offset)
            k_input = k_input + fixed_pos_emb(k_input.shape[1], self.dim)

        q = nn.Dense(inner, use_bias=False, name="to_q")(q_input)
        k = nn.Dense(inner, use_bias=False, name="to_k")(k_input)
        v = nn.Dense(inner, use_bias=False, name="to_v")(v_input)
        split = lambda t: t.reshape(b, t.shape[1], h, self.dim_head).transpose(0, 2, 1, 3)
        q, k, v = split(q), split(k), split(v)

        input_mask = None
        if mask is not None or context_mask is not None:
            q_mask = mask if mask is not None else jnp.ones((b, n), bool)
            k_mask = q_mask if context is None else context_mask
            if k_mask is None:
                k_mask = jnp.ones((b, k.shape[-2]), bool)
            input_mask = q_mask[:, None, :, None] * k_mask[:, None, None, :]

        if self.num_mem_kv > 0:
            init = nn.initializers.normal(1.0)
            mem_k = self.param("mem_k", init, (h, self.num_mem_kv, self.dim_head))
            mem_v = self.param("mem_v", init, (h, self.num_mem_kv, self.dim_head))
            k = jnp.concatenate([jnp.broadcast_to(mem_k, (b,) + mem_k.shape), k], -2)
            v = jnp.concatenate([jnp.broadcast_to(mem_v, (b,) + mem_v.shape), v], -2)
            if input_mask is not None:
                input_mask = jnp.pad(input_mask,
                                     ((0, 0),) * 3 + ((self.num_mem_kv, 0),),
                                     constant_values=True)

        dots = jnp.einsum("bhid,bhjd->bhij", q, k) * scale
        mask_value = -jnp.finfo(dots.dtype).max
        if prev_attn is not None:
            dots = dots + prev_attn
        pre_softmax_attn = dots

        if self.talking_heads:
            init = nn.initializers.normal(1.0)
            pre_proj = self.param("pre_softmax_proj", init, (h, h))
            post_proj = self.param("post_softmax_proj", init, (h, h))
            dots = jnp.einsum("bhij,hk->bkij", dots, pre_proj)

        if input_mask is not None:
            dots = jnp.where(input_mask, dots, mask_value)
        if self.causal:
            i, j = dots.shape[-2:]
            # reference builds an (i,i) upper mask then left-pads to (i,j)
            # with False — memory columns are never causally masked (:337-342)
            causal_mask = (jnp.arange(i)[:, None]
                           < jnp.arange(j)[None, :] - (j - i))
            dots = jnp.where(causal_mask, mask_value, dots)
        if self.sparse_topk is not None and self.sparse_topk < dots.shape[-1]:
            top = jax.lax.top_k(dots, self.sparse_topk)[0]
            dots = jnp.where(dots < top[..., -1:], mask_value, dots)

        attn = jax.nn.softmax(dots, axis=-1)
        post_softmax_attn = attn
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        if self.talking_heads:
            attn = jnp.einsum("bhij,hk->bkij", attn, post_proj)

        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        if self.on_attn:
            # attention-on-attention: Linear(dim*2) + GLU (:264-266)
            a, g = jnp.split(nn.Dense(self.dim * 2, name="to_out_0")(out), 2, -1)
            out = a * jax.nn.sigmoid(g)
        else:
            out = nn.Dense(self.dim, name="to_out")(out)
        return out, {"pre_softmax_attn": pre_softmax_attn,
                     "post_softmax_attn": post_softmax_attn}


def _layer_types(depth, cross_attend, only_cross, macaron, custom_layers,
                 par_ratio, sandwich_coef) -> tuple:
    """Static layout logic (reference :436-460)."""
    if cross_attend and not only_cross:
        default_block = ("a", "c", "f")
    elif cross_attend and only_cross:
        default_block = ("c", "f")
    else:
        default_block = ("a", "f")
    if macaron:
        default_block = ("f",) + default_block
    if custom_layers is not None:
        return tuple(custom_layers)
    if par_ratio is not None:
        par_depth = depth * len(default_block)
        assert 1 < par_ratio <= par_depth, "par ratio out of range"
        default_block = tuple(t for t in default_block if t != "f")
        par_attn = par_depth // par_ratio
        depth_cut = par_depth * 2 // 3
        par_width = (depth_cut + depth_cut // par_attn) // par_attn
        assert len(default_block) <= par_width, \
            "default block is too large for par_ratio"
        par_block = default_block + ("f",) * (par_width - len(default_block))
        par_head = par_block * par_attn
        return par_head + ("f",) * (par_depth - len(par_head))
    if sandwich_coef is not None:
        assert 0 < sandwich_coef <= depth, \
            "sandwich coefficient should be less than the depth"
        return (("a",) * sandwich_coef + default_block * (depth - sandwich_coef)
                + ("f",) * sandwich_coef)
    return default_block * depth


class AttentionLayers(nn.Module):
    """(:370-538). Layer i's torch keys `layers.{i}.{0,1,2}` map to our
    `norms_{i}` / `blocks_{i}` / `residuals_{i}` submodules."""
    dim: int
    depth: int
    heads: int = 8
    causal: bool = False
    cross_attend: bool = False
    only_cross: bool = False
    use_scalenorm: bool = False
    use_rmsnorm: bool = False
    use_rezero: bool = False
    position_infused_attn: bool = False
    custom_layers: Optional[Sequence[str]] = None
    sandwich_coef: Optional[int] = None
    par_ratio: Optional[int] = None
    residual_attn: bool = False
    cross_residual_attn: bool = False
    macaron: bool = False
    pre_norm: bool = True
    gate_residual: bool = False
    attn_kwargs: Any = None   # dict: dim_head/talking_heads/sparse_topk/...
    ff_kwargs: Any = None     # dict: glu/mult/dropout/...

    @property
    def has_pos_emb(self) -> bool:
        return self.position_infused_attn

    @property
    def layer_types(self) -> tuple:
        return _layer_types(self.depth, self.cross_attend, self.only_cross,
                            self.macaron, self.custom_layers, self.par_ratio,
                            self.sandwich_coef)

    @nn.compact
    def __call__(self, x, context=None, mask=None, context_mask=None,
                 mems=None, deterministic: bool = True):
        attn_kwargs = dict(self.attn_kwargs or {})
        ff_kwargs = dict(self.ff_kwargs or {})
        types = self.layer_types
        num_attn = sum(1 for t in types if t == "a")
        mems = list(mems) if mems is not None else [None] * num_attn

        hiddens, intermediates = [], []
        prev_attn = prev_cross_attn = None
        for ind, layer_type in enumerate(types):
            is_last = ind == len(types) - 1
            if layer_type == "a":
                hiddens.append(x)
                layer_mem = mems.pop(0)
            residual = x
            if self.use_rezero:
                norm = lambda t: t  # Identity; Rezero gain wraps the block
            elif self.use_rmsnorm:
                norm = RMSNorm(self.dim, name=f"norms_{ind}")
            elif self.use_scalenorm:
                norm = ScaleNorm(self.dim, name=f"norms_{ind}")
            else:
                # torch LN semantics: eps 1e-5 + two-pass variance (the
                # x_transformer embeddings have variance ~1e-3, so flax's
                # 1e-6 default alone shifts outputs by ~1e-2)
                norm = nn.LayerNorm(epsilon=1e-5, use_fast_variance=False,
                                    name=f"norms_{ind}")
            if self.pre_norm:
                x = norm(x)

            if layer_type == "a":
                block = Attention(self.dim, heads=self.heads,
                                  causal=self.causal, name=f"blocks_{ind}",
                                  **attn_kwargs)
                out, inter = block(x, mask=mask,
                                   sinusoidal_emb=self.position_infused_attn,
                                   prev_attn=prev_attn, mem=layer_mem,
                                   deterministic=deterministic)
            elif layer_type == "c":
                block = Attention(self.dim, heads=self.heads,
                                  name=f"blocks_{ind}", **attn_kwargs)
                out, inter = block(x, context=context, mask=mask,
                                   context_mask=context_mask,
                                   prev_attn=prev_cross_attn,
                                   deterministic=deterministic)
            else:
                out = FeedForward(self.dim, name=f"blocks_{ind}",
                                  **ff_kwargs)(x, deterministic=deterministic)
                if self.macaron:
                    out = out * 0.5  # Scale(0.5, ff) (:463-465)

            if self.use_rezero and layer_type in ("a", "c"):
                # Rezero wraps only Attention blocks (:466-467)
                g = self.param(f"rezero_g_{ind}", nn.initializers.zeros, (1,))
                out = out * g

            if self.gate_residual:
                x = GRUGating(self.dim, name=f"residuals_{ind}")(out, residual)
            else:
                x = out + residual

            if layer_type in ("a", "c"):
                intermediates.append(inter)
            if layer_type == "a" and self.residual_attn:
                prev_attn = inter["pre_softmax_attn"]
            elif layer_type == "c" and self.cross_residual_attn:
                prev_cross_attn = inter["pre_softmax_attn"]
            if not self.pre_norm and not is_last:
                x = norm(x)
        return x, {"hiddens": hiddens, "attn_intermediates": intermediates}


def encoder_config(**kwargs) -> dict:
    """Group reference-style flat kwargs (`attn_*`, `ff_*`) into our
    AttentionLayers fields — the reference's groupby_prefix_and_trim
    (:106-114) + Encoder's causal assert (:541-544)."""
    assert "causal" not in kwargs, "cannot set causality on encoder"
    ff = {k[3:]: v for k, v in kwargs.items() if k.startswith("ff_")}
    attn = {k[5:]: v for k, v in kwargs.items() if k.startswith("attn_")}
    rest = {k: v for k, v in kwargs.items()
            if not k.startswith(("ff_", "attn_"))}
    return dict(causal=False, attn_kwargs=attn, ff_kwargs=ff, **rest)


class TransformerWrapperX(nn.Module):
    """Full TransformerWrapper (:548-641). Named `...X` to avoid clashing
    with the shipped-default `text_embedders.TransformerWrapper`."""
    num_tokens: int
    max_seq_len: int
    attn_layers: dict          # AttentionLayers field dict (see encoder_config)
    emb_dim: Optional[int] = None
    max_mem_len: int = 0
    emb_dropout: float = 0.0
    num_memory_tokens: int = 0
    tie_embedding: bool = False
    use_pos_emb: bool = True

    @nn.compact
    def __call__(self, tokens, return_embeddings: bool = False, mask=None,
                 return_mems: bool = False, return_attn: bool = False,
                 mems=None, context=None, context_mask=None,
                 deterministic: bool = True):
        layers = AttentionLayers(name="attn_layers", **self.attn_layers)
        dim = layers.dim
        emb_dim = self.emb_dim or dim
        b, n = tokens.shape

        token_emb = nn.Embed(self.num_tokens, emb_dim, name="token_emb",
                             embedding_init=nn.initializers.normal(0.02))
        x = token_emb(tokens)
        if self.use_pos_emb and not layers.has_pos_emb:
            x = x + AbsolutePositionalEmbedding(emb_dim, self.max_seq_len,
                                                name="pos_emb")(n)
        x = nn.Dropout(self.emb_dropout)(x, deterministic=deterministic)
        if emb_dim != dim:
            x = nn.Dense(dim, name="project_emb")(x)

        num_mem = self.num_memory_tokens
        if num_mem > 0:
            mem_tok = self.param("memory_tokens", nn.initializers.normal(1.0),
                                 (num_mem, dim))
            x = jnp.concatenate(
                [jnp.broadcast_to(mem_tok, (b,) + mem_tok.shape), x], axis=1)
            if mask is not None:
                mask = jnp.pad(mask, ((0, 0), (num_mem, 0)),
                               constant_values=True)

        x, inter = layers(x, mask=mask, mems=mems, context=context,
                          context_mask=context_mask,
                          deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, use_fast_variance=False,
                         name="norm")(x)
        mem, x = x[:, :num_mem], x[:, num_mem:]

        if return_embeddings:
            out = x
        elif self.tie_embedding:
            out = x @ token_emb.embedding.T
        else:
            out = nn.Dense(self.num_tokens, name="to_logits")(x)

        if return_mems:
            hiddens = inter["hiddens"]
            if mems is not None:
                new_mems = [jnp.concatenate(pair, axis=-2)
                            for pair in zip(mems, hiddens)]
            else:
                new_mems = hiddens
            new_mems = [jax.lax.stop_gradient(t[..., -int(self.max_mem_len):, :])
                        for t in new_mems]
            return out, new_mems
        if return_attn:
            return out, [i["post_softmax_attn"]
                         for i in inter["attn_intermediates"]]
        return out


# --------------------------------------------------------------- torch import
def _t(w) -> np.ndarray:
    return np.asarray(w.detach().cpu().numpy() if hasattr(w, "detach") else w)


def import_x_transformer_torch(params: dict, state_dict: dict,
                               model: TransformerWrapperX) -> dict:
    """Map a reference `TransformerWrapper.state_dict()` onto our params.

    Torch layer entry i is `attn_layers.layers.{i}.{0:norm,1:block,2:residual}`
    with optional Rezero (`1.g` + `1.fn.*`) and macaron Scale (`1.fn.*`)
    wrappers; Linears transpose, everything else copies."""
    import flax

    flat = dict(flax.traverse_util.flatten_dict(params, sep="/"))
    sd = {k: _t(v) for k, v in state_dict.items()}
    layers_cfg = model.attn_layers
    al = AttentionLayers(**layers_cfg)
    types = al.layer_types
    use_rezero = layers_cfg.get("use_rezero", False)
    macaron = layers_cfg.get("macaron", False)

    def put(fk, arr, transpose=False):
        assert fk in flat, f"missing flax param {fk}"
        arr = arr.T if transpose else arr
        assert flat[fk].shape == arr.shape, (fk, flat[fk].shape, arr.shape)
        flat[fk] = jnp.asarray(arr, flat[fk].dtype)

    def linear(prefix_t, prefix_f, bias=True):
        put(f"{prefix_f}/kernel", sd[f"{prefix_t}.weight"], transpose=True)
        if bias and f"{prefix_t}.bias" in sd:
            put(f"{prefix_f}/bias", sd[f"{prefix_t}.bias"])

    put("token_emb/embedding", sd["token_emb.weight"])
    if "pos_emb.emb.weight" in sd:
        put("pos_emb/emb/embedding", sd["pos_emb.emb.weight"])
    if "project_emb.weight" in sd:
        linear("project_emb", "project_emb")
    if "memory_tokens" in sd:
        put("memory_tokens", sd["memory_tokens"])
    put("norm/scale", sd["norm.weight"])
    put("norm/bias", sd["norm.bias"])
    if "to_logits.weight" in sd:
        linear("to_logits", "to_logits")

    for i, lt in enumerate(types):
        t0 = f"attn_layers.layers.{i}"
        # norm (absent under rezero: nn.Identity has no params). In post-norm
        # mode the reference instantiates a norm for the LAST layer but never
        # calls it (x_transformer.py:536-537) — our tree has no params for it,
        # so map norms only where flax created them.
        has_flax_norm = any(k.startswith(f"attn_layers/norms_{i}/")
                            for k in flat)
        if f"{t0}.0.weight" in sd and has_flax_norm:  # LayerNorm
            put(f"attn_layers/norms_{i}/scale", sd[f"{t0}.0.weight"])
            if f"{t0}.0.bias" in sd:
                put(f"attn_layers/norms_{i}/bias", sd[f"{t0}.0.bias"])
        elif f"{t0}.0.g" in sd and has_flax_norm:  # ScaleNorm / RMSNorm
            put(f"attn_layers/norms_{i}/g", sd[f"{t0}.0.g"])
        # block, unwrapping Rezero (attention only) / macaron Scale (ff only)
        blk = f"{t0}.1"
        if lt in ("a", "c") and use_rezero:
            put(f"attn_layers/rezero_g_{i}", sd[f"{blk}.g"])
            blk = f"{blk}.fn"
        if lt == "f" and macaron:
            blk = f"{blk}.fn"
        fb = f"attn_layers/blocks_{i}"
        if lt in ("a", "c"):
            for name in ("to_q", "to_k", "to_v"):
                linear(f"{blk}.{name}", f"{fb}/{name}", bias=False)
            if f"{blk}.to_out.0.weight" in sd:  # on_attn Sequential
                linear(f"{blk}.to_out.0", f"{fb}/to_out_0")
            else:
                linear(f"{blk}.to_out", f"{fb}/to_out")
            for p in ("pre_softmax_proj", "post_softmax_proj", "mem_k", "mem_v"):
                if f"{blk}.{p}" in sd:
                    put(f"{fb}/{p}", sd[f"{blk}.{p}"])
        else:
            if f"{blk}.net.0.proj.weight" in sd:  # GEGLU
                linear(f"{blk}.net.0.proj", f"{fb}/net_0/proj")
            else:
                linear(f"{blk}.net.0.0", f"{fb}/net_0")
            linear(f"{blk}.net.2", f"{fb}/net_2")
        # residual (GRUGating)
        for p in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
            if f"{t0}.2.gru.{p}" in sd:
                put(f"attn_layers/residuals_{i}/{p}", sd[f"{t0}.2.gru.{p}"])
    return flax.traverse_util.unflatten_dict(flat, sep="/")
