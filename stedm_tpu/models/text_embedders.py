"""Text / class conditioning encoders (dead in the shipped reference configs).

Reference surface (`ldm/modules/encoders/modules.py:19-101` +
`ldm/modules/x_transformer.py`):

* ``ClassEmbedder`` (modules.py:19-31) — embedding lookup on an integer class
  key, returned as a length-1 crossattn sequence.
* ``TransformerEmbedder`` (modules.py:34-48) — token ids -> a lucidrains-style
  ``TransformerWrapper(num_tokens, max_seq_len, Encoder(dim, depth))`` run with
  ``return_embeddings=True``.
* ``BERTTokenizer`` (modules.py:51-75) — host-side HuggingFace
  ``BertTokenizerFast`` producing fixed-length (max_length-padded) token ids.
* ``BERTEmbedder`` (modules.py:78-101) — tokenizer + TransformerWrapper with
  ``emb_dropout``.

The transformer itself (x_transformer.py:548-640 via AttentionLayers
:370-538) at the defaults the embedders instantiate is: learned token +
absolute positional embeddings (std-0.02 init, :25-36,595-596), ``depth``
pre-norm blocks of [LayerNorm -> 8-head dim-64 attention -> residual] then
[LayerNorm -> GELU MLP (mult 4) -> residual] (:424-479, defaults
``('a','f')`` per depth), a final LayerNorm, and either raw embeddings or a
vocab-projection head (:628). None of the exotic switches (rezero, talking
heads, macaron, memory tokens, relative positions...) are reachable from the
embedder constructors, so this TPU rebuild implements exactly the reachable
default path — one fused-friendly einsum attention per block, static shapes,
norms in fp32.

Deviation (by design, for jit-ability): tokenization is host-side —
``BERTEmbedder`` the *module* consumes token ids; ``BERTTokenizer`` (a plain
host class, transformers-gated) turns strings into the padded id matrix, and
``BERTEmbedder.encode_text`` glues the two for interactive use.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any

# torch LayerNorm default (x_transformer.py:417 uses nn.LayerNorm as-is)
LN_EPS = 1e-5


def _ln(name: str) -> nn.LayerNorm:
    return nn.LayerNorm(epsilon=LN_EPS, dtype=jnp.float32,
                        use_fast_variance=False, name=name)


class _Attention(nn.Module):
    """Default-path self-attention (x_transformer.py:215-367: bias-free q/k/v,
    biased output projection, softmax over key axis, mask fill with the dtype
    min)."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 mask: jnp.ndarray | None = None) -> jnp.ndarray:
        b, n, _ = x.shape
        inner = self.heads * self.dim_head
        dense = lambda name: nn.Dense(inner, use_bias=False, dtype=self.dtype,
                                      name=name)
        split = lambda t: t.reshape(b, n, self.heads, self.dim_head)
        q = split(dense("to_q")(x))
        k = split(dense("to_k")(x))
        v = split(dense("to_v")(x))

        dots = jnp.einsum("bihd,bjhd->bhij", q, k) * (self.dim_head ** -0.5)
        if mask is not None:
            # q_mask[:,None,:,None] * k_mask[:,None,None,:]
            # (x_transformer.py:302-309; self-attention shares one mask)
            pair = mask[:, None, :, None] & mask[:, None, None, :]
            dots = jnp.where(pair, dots, -jnp.finfo(dots.dtype).max)
        attn = jax.nn.softmax(dots.astype(jnp.float32),
                              axis=-1).astype(dots.dtype)
        out = jnp.einsum("bhij,bjhd->bihd", attn, v).reshape(b, n, inner)
        return nn.Dense(self.dim, dtype=self.dtype, name="to_out")(out)


class _FeedForward(nn.Module):
    """Non-GLU default MLP (x_transformer.py:194-211): Linear -> exact GELU ->
    Linear, expansion 4."""

    dim: int
    mult: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(int(self.dim * self.mult), dtype=self.dtype,
                     name="ff_in")(x)
        h = jax.nn.gelu(h, approximate=False)  # torch nn.GELU() is erf-exact
        return nn.Dense(self.dim, dtype=self.dtype, name="ff_out")(h)


class TransformerWrapper(nn.Module):
    """The reachable-default ``TransformerWrapper`` (x_transformer.py:548-640):
    token + absolute positional embedding, ``depth`` pre-norm attn/ff blocks,
    final LayerNorm, embeddings or logits."""

    num_tokens: int
    max_seq_len: int
    dim: int
    depth: int
    heads: int = 8
    dim_head: int = 64
    emb_dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, *,
                 mask: jnp.ndarray | None = None,
                 return_embeddings: bool = True,
                 deterministic: bool = True) -> jnp.ndarray:
        n = tokens.shape[1]
        if n > self.max_seq_len:
            raise ValueError(f"sequence length {n} > max_seq_len "
                             f"{self.max_seq_len}")
        emb_init = nn.initializers.normal(stddev=0.02)  # init_ + :32
        x = nn.Embed(self.num_tokens, self.dim, embedding_init=emb_init,
                     dtype=self.dtype, name="token_emb")(tokens)
        pos = nn.Embed(self.max_seq_len, self.dim, embedding_init=emb_init,
                       dtype=self.dtype, name="pos_emb")(jnp.arange(n))
        x = x + pos[None]
        if self.emb_dropout > 0.0:
            x = nn.Dropout(self.emb_dropout)(x, deterministic=deterministic)

        for i in range(self.depth):
            h = _ln(f"attn_norm_{i}")(x).astype(self.dtype)
            x = x + _Attention(self.dim, self.heads, self.dim_head,
                               dtype=self.dtype, name=f"attn_{i}")(h, mask)
            h = _ln(f"ff_norm_{i}")(x).astype(self.dtype)
            x = x + _FeedForward(self.dim, dtype=self.dtype,
                                 name=f"ff_{i}")(h)

        x = _ln("norm")(x).astype(self.dtype)
        if return_embeddings:
            return x
        return nn.Dense(self.num_tokens, dtype=self.dtype,
                        name="to_logits")(x)


class ClassEmbedder(nn.Module):
    """(modules.py:19-31) — class id -> (B, 1, embed_dim) crossattn context."""

    embed_dim: int
    n_classes: int = 1000
    key: str = "class"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, batch, key: str | None = None) -> jnp.ndarray:
        c = batch[self.key if key is None else key]
        return nn.Embed(self.n_classes, self.embed_dim,
                        dtype=self.dtype, name="embedding")(c[:, None])


class TransformerEmbedder(nn.Module):
    """(modules.py:34-48) — token ids -> per-token embeddings."""

    n_embed: int
    n_layer: int
    vocab_size: int
    max_seq_len: int = 77
    dtype: Dtype = jnp.float32

    def setup(self):
        self.transformer = TransformerWrapper(
            num_tokens=self.vocab_size, max_seq_len=self.max_seq_len,
            dim=self.n_embed, depth=self.n_layer, dtype=self.dtype,
            name="transformer")

    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        return self.transformer(tokens, return_embeddings=True)

    def encode(self, tokens: jnp.ndarray) -> jnp.ndarray:
        return self(tokens)


class BERTEmbedder(nn.Module):
    """(modules.py:78-101) — BERT-vocab transformer encoder. The module
    consumes token ids (host-side tokenization; see `BERTTokenizer` /
    `encode_text`); ``emb_dropout`` matches the reference's
    ``embedding_dropout`` knob."""

    n_embed: int
    n_layer: int
    vocab_size: int = 30522
    max_seq_len: int = 77
    embedding_dropout: float = 0.0
    dtype: Dtype = jnp.float32

    def setup(self):
        self.transformer = TransformerWrapper(
            num_tokens=self.vocab_size, max_seq_len=self.max_seq_len,
            dim=self.n_embed, depth=self.n_layer,
            emb_dropout=self.embedding_dropout, dtype=self.dtype,
            name="transformer")

    def __call__(self, tokens: jnp.ndarray, *,
                 deterministic: bool = True) -> jnp.ndarray:
        return self.transformer(tokens, return_embeddings=True,
                                deterministic=deterministic)

    def encode(self, tokens: jnp.ndarray) -> jnp.ndarray:
        return self(tokens)


class BERTTokenizer:
    """Host-side fixed-length tokenizer (modules.py:51-75). Requires the
    ``bert-base-uncased`` HuggingFace tokenizer to be loadable (cached or
    staged locally — this image has no egress); construction raises a clear
    RuntimeError otherwise.

    ``vq_interface=True`` reproduces the reference's quantizer-shaped return
    ``(None, None, [None, None, tokens])`` so it can sit where a VQ first
    stage is expected.
    """

    def __init__(self, vq_interface: bool = True, max_length: int = 77,
                 name_or_path: str = "bert-base-uncased"):
        try:
            from transformers import BertTokenizerFast
            self.tokenizer = BertTokenizerFast.from_pretrained(name_or_path)
        except Exception as e:  # no egress / no cache / no transformers
            raise RuntimeError(
                f"BERT tokenizer {name_or_path!r} unavailable (stage it "
                f"locally and pass its path): {e}") from e
        self.vq_interface = vq_interface
        self.max_length = max_length

    def __call__(self, text: list[str] | str) -> np.ndarray:
        enc = self.tokenizer(text, truncation=True,
                             max_length=self.max_length, return_length=True,
                             return_overflowing_tokens=False,
                             padding="max_length", return_tensors="np")
        return enc["input_ids"]

    def encode(self, text):
        tokens = self(text)
        if not self.vq_interface:
            return tokens
        return None, None, [None, None, tokens]

    def decode(self, text):
        return text


def encode_text(embedder: BERTEmbedder, params, texts: list[str] | str,
                tokenizer: BERTTokenizer | None = None) -> jnp.ndarray:
    """Host glue reproducing ``BERTEmbedder.forward`` with ``use_tknz_fn``
    (modules.py:91-97): tokenize on host, embed on device."""
    tok = tokenizer or BERTTokenizer(vq_interface=False,
                                     max_length=embedder.max_seq_len)
    return embedder.apply({"params": params}, jnp.asarray(tok(texts)))
