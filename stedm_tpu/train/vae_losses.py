"""VAE perceptual + adversarial losses and codec fine-tune steps (TPU-native).

Rebuilds the reference's VAE loss stack — ``VQLPIPSWithDiscriminator``
(reference ldm/modules/losses/vqperceptual.py:43-167) and
``LPIPSWithDiscriminator`` (reference ldm/modules/losses/contperceptual.py:7-111)
plus the taming helpers they import (hinge/vanilla d-losses, ``adopt_weight``,
``measure_perplexity``, the grad-norm adaptive discriminator weight). The
reference ships these **dead** (the vq-f4 config sets ``lossconfig:
torch.nn.Identity``; SURVEY.md §2.4 "VAE losses") but they are the only path to
(re-)train the first-stage codec, so we provide them live for ``train_ae.py``.

TPU-first design:
- Everything is a pure function over explicit param trees; the torch class's
  hidden state (LPIPS net, discriminator, logvar) becomes arguments.
- The reference's two-optimizer Lightning dance (``optimizer_idx`` 0/1 per
  batch) becomes two independently jitted steps over one shared forward
  convention; ``global_step`` gating (``adopt_weight``) is a traced
  ``jnp.where`` so the step counter stays on device — no recompiles at
  ``disc_start``.
- ``calculate_adaptive_weight`` (vqperceptual.py:85-96) needs
  d(nll)/d(last_w) and d(g)/d(last_w) for the decoder's final conv only. The
  torch version runs ``autograd.grad`` twice with ``retain_graph``; here one
  ``jax.vjp`` of a (nll, g) pair w.r.t. the last kernel shares the forward and
  pulls two short cotangents — XLA keeps it all in one program.
- The discriminator's BatchNorm uses batch statistics in both steps (torch
  train-mode semantics); running averages are folded only by the
  discriminator step (the generator step's stat updates are discarded —
  running stats only serve eval).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

Array = jnp.ndarray


# --- taming loss helpers (taming/modules/losses/vqperceptual.py) ---

def hinge_d_loss(logits_real: Array, logits_fake: Array) -> Array:
    return 0.5 * (jnp.mean(jax.nn.relu(1.0 - logits_real))
                  + jnp.mean(jax.nn.relu(1.0 + logits_fake)))


def vanilla_d_loss(logits_real: Array, logits_fake: Array) -> Array:
    return 0.5 * (jnp.mean(jax.nn.softplus(-logits_real))
                  + jnp.mean(jax.nn.softplus(logits_fake)))


def adopt_weight(weight, global_step, threshold: int = 0, value: float = 0.0):
    """reference vqperceptual.py:20-23, traced (no recompile at the switch)."""
    return jnp.where(global_step < threshold, value, weight)


def measure_perplexity(idx: Array, n_embed: int) -> tuple[Array, Array]:
    """Codebook usage stats (reference vqperceptual.py:26-33)."""
    counts = jnp.bincount(idx.reshape(-1), length=n_embed)
    avg_probs = counts / idx.size
    perplexity = jnp.exp(-jnp.sum(avg_probs * jnp.log(avg_probs + 1e-10)))
    return perplexity, jnp.sum(avg_probs > 0)


# --- loss configuration (constructor args of the reference classes) ---

@dataclass(frozen=True)
class VAELossConfig:
    """Union of the two reference loss constructors (vqperceptual.py:44-48,
    contperceptual.py:8-11); `kl_weight`/`logvar_init` only drive the KL
    variant, `codebook_weight` only the VQ variant."""

    disc_start: int = 0
    codebook_weight: float = 1.0
    pixelloss_weight: float = 1.0
    disc_num_layers: int = 3
    disc_in_channels: int = 3
    disc_factor: float = 1.0
    disc_weight: float = 1.0
    perceptual_weight: float = 1.0
    use_actnorm: bool = False
    disc_conditional: bool = False
    disc_ndf: int = 64
    disc_loss: str = "hinge"
    pixel_loss: str = "l1"
    kl_weight: float = 1.0
    logvar_init: float = 0.0

    def d_loss(self):
        if self.disc_loss == "hinge":
            return hinge_d_loss
        if self.disc_loss == "vanilla":
            return vanilla_d_loss
        raise ValueError(f"Unknown GAN loss {self.disc_loss!r}")

    def px_loss(self):
        if self.pixel_loss == "l1":
            return lambda x, y: jnp.abs(x - y)
        if self.pixel_loss == "l2":
            return lambda x, y: jnp.square(x - y)
        raise ValueError(f"Unknown pixel loss {self.pixel_loss!r}")


def build_discriminator(cfg: VAELossConfig, dtype=jnp.float32):
    from stedm_tpu.models.discriminator import NLayerDiscriminator

    return NLayerDiscriminator(
        input_nc=cfg.disc_in_channels, ndf=cfg.disc_ndf,
        n_layers=cfg.disc_num_layers, use_actnorm=cfg.use_actnorm, dtype=dtype)


# --- reconstruction terms ---

def nll_terms(cfg: VAELossConfig, lpips_apply, inputs: Array, rec: Array):
    """Pixel + perceptual reconstruction loss map [B,H,W,C]
    (vqperceptual.py:102-112; LPIPS broadcasts as [B,1,1,1])."""
    rec_loss = cfg.px_loss()(inputs, rec) * cfg.pixelloss_weight
    p_loss = jnp.zeros((inputs.shape[0], 1, 1, 1), jnp.float32)
    if cfg.perceptual_weight > 0 and lpips_apply is not None:
        p_loss = lpips_apply(inputs, rec)
        rec_loss = rec_loss + cfg.perceptual_weight * p_loss
    return rec_loss, p_loss


def adaptive_weight(cfg: VAELossConfig, nll_grad: Array, g_grad: Array):
    """d_weight = |∇nll| / (|∇g| + 1e-4), clipped (vqperceptual.py:85-96)."""
    d_weight = (jnp.linalg.norm(nll_grad.reshape(-1))
                / (jnp.linalg.norm(g_grad.reshape(-1)) + 1e-4))
    return jax.lax.stop_gradient(
        jnp.clip(d_weight, 0.0, 1e4)) * cfg.disc_weight


def _get_path(tree, path: tuple[str, ...]):
    for k in path:
        tree = tree[k]
    return tree


def _set_path(tree, path: tuple[str, ...], value):
    if not path:
        return value
    out = dict(tree)
    out[path[0]] = _set_path(tree[path[0]], path[1:], value)
    return out


def vq_generator_loss(cfg: VAELossConfig, *, forward, disc_apply, lpips_apply,
                      last_layer_path: tuple[str, ...]):
    """Build the generator-side loss (reference optimizer_idx==0 branch,
    vqperceptual.py:115-149).

    ``forward(gen_params) -> (rec, emb_loss, idx)`` is the codec's training
    forward; ``disc_apply(rec) -> logits``; ``lpips_apply(x, y) -> [B,1,1,1]``
    (or None to disable the perceptual term); ``last_layer_path`` addresses the
    decoder's final conv kernel inside ``gen_params`` for the adaptive weight.

    Returns ``loss_fn(gen_params, inputs, global_step) -> (loss, log)`` — pure
    and jittable; take ``jax.grad`` of it for the update.
    """

    def loss_fn(gen_params, inputs: Array, global_step):
        last_w = _get_path(gen_params, last_layer_path)

        def heads(w):
            p = _set_path(gen_params, last_layer_path, w)
            rec, emb_loss, idx = forward(p)
            rec_loss, p_loss = nll_terms(cfg, lpips_apply, inputs, rec)
            nll = jnp.mean(rec_loss)
            g = -jnp.mean(disc_apply(rec))
            return (nll, g), (rec, emb_loss, idx, p_loss)

        # one forward, two short cotangent pulls w.r.t. the last kernel only
        (nll, g), vjp, aux = jax.vjp(heads, last_w, has_aux=True)
        one, zero = jnp.float32(1.0), jnp.float32(0.0)
        nll_grad = vjp((one, zero))[0]
        g_grad = vjp((zero, one))[0]
        d_weight = adaptive_weight(cfg, nll_grad, g_grad)

        _, emb_loss, idx, p_loss = aux
        disc_factor = adopt_weight(cfg.disc_factor, global_step,
                                   threshold=cfg.disc_start)
        loss = (nll + d_weight * disc_factor * g
                + cfg.codebook_weight * jnp.mean(emb_loss))
        log = {"total_loss": loss, "quant_loss": jnp.mean(emb_loss),
               "nll_loss": nll, "p_loss": jnp.mean(p_loss),
               "d_weight": d_weight, "disc_factor": disc_factor, "g_loss": g}
        return loss, (log, idx)

    return loss_fn


def kl_generator_loss(cfg: VAELossConfig, *, forward, disc_apply, lpips_apply,
                      last_layer_path: tuple[str, ...]):
    """KL-VAE generator loss (reference contperceptual.py:45-92,
    optimizer_idx==0). ``forward(gen_params) -> (rec, posterior)`` where the
    posterior is a `stedm_tpu.models.autoencoder_kl.DiagonalGaussian`; the
    trainable output log-variance lives in ``gen_params['lossvar']['logvar']``
    (torch: ``self.logvar``, contperceptual.py:20)."""

    def loss_fn(gen_params, inputs: Array, global_step):
        last_w = _get_path(gen_params, last_layer_path)
        logvar = gen_params["lossvar"]["logvar"]

        def heads(w):
            p = _set_path(gen_params, last_layer_path, w)
            rec, posterior = forward(p)
            rec_loss, p_loss = nll_terms(cfg, lpips_apply, inputs, rec)
            # contperceptual.py:53-58 — sum over elements / batch size
            nll_map = rec_loss / jnp.exp(logvar) + logvar
            nll = jnp.sum(nll_map) / nll_map.shape[0]
            g = -jnp.mean(disc_apply(rec))
            return (nll, g), (posterior, p_loss)

        (nll, g), vjp, (posterior, p_loss) = jax.vjp(heads, last_w,
                                                     has_aux=True)
        one, zero = jnp.float32(1.0), jnp.float32(0.0)
        nll_grad = vjp((one, zero))[0]
        g_grad = vjp((zero, one))[0]
        d_weight = adaptive_weight(cfg, nll_grad, g_grad)

        kl = posterior.kl()
        kl_loss = jnp.sum(kl) / kl.shape[0]
        disc_factor = adopt_weight(cfg.disc_factor, global_step,
                                   threshold=cfg.disc_start)
        loss = nll + cfg.kl_weight * kl_loss + d_weight * disc_factor * g
        log = {"total_loss": loss, "logvar": logvar, "kl_loss": kl_loss,
               "nll_loss": nll, "p_loss": jnp.mean(p_loss),
               "d_weight": d_weight, "disc_factor": disc_factor, "g_loss": g}
        return loss, log

    return loss_fn


def discriminator_loss(cfg: VAELossConfig, *, disc_apply):
    """Discriminator-side loss (reference optimizer_idx==1 branch,
    vqperceptual.py:151-167 == contperceptual.py:94-110).

    ``disc_apply(disc_params, disc_state, x) -> (logits, new_state)`` where
    ``disc_state`` carries BatchNorm statistics; inputs and reconstructions
    arrive already detached (the caller stops gradients by construction — rec
    is data here). Differentiate w.r.t. the first argument."""

    d_loss_fn = cfg.d_loss()

    def loss_fn(disc_params, disc_state, inputs: Array, rec: Array,
                global_step):
        logits_real, disc_state = disc_apply(disc_params, disc_state, inputs)
        logits_fake, disc_state = disc_apply(disc_params, disc_state, rec)
        disc_factor = adopt_weight(cfg.disc_factor, global_step,
                                   threshold=cfg.disc_start)
        d_loss = disc_factor * d_loss_fn(logits_real, logits_fake)
        log = {"disc_loss": d_loss,
               "logits_real": jnp.mean(logits_real),
               "logits_fake": jnp.mean(logits_fake)}
        return d_loss, (log, disc_state)

    return loss_fn
