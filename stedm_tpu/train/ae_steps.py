"""Jittable VQGAN codec fine-tune steps (the reference's VQModel training).

The reference's ``VQModel.training_step`` (reference ldm/models/autoencoder.py:
135-158 via taming) alternates two Lightning optimizers per batch: generator
(autoencoder + codebook) against discriminator, both through
``VQLPIPSWithDiscriminator``. The shipped STEDM config never runs it
(``lossconfig: torch.nn.Identity`` — the codec is frozen), but it is the only
way to adapt the codec to a new stain/domain; ``train_ae.py`` drives these
steps.

TPU-first shape: two pure jitted steps sharing one batch — the generator step
returns the (stop-gradient) reconstruction so the discriminator step reuses it
instead of re-running the codec. All param trees are ARGUMENTS (never closed
over — closed-over trees serialize into the module as constants, CLAUDE.md).
Both optimizers are Adam(lr, 0.5, 0.9) like the reference
(autoencoder.py:160-173).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from stedm_tpu.train.vae_losses import (
    VAELossConfig,
    build_discriminator,
    discriminator_loss,
    kl_generator_loss,
    measure_perplexity,
    vq_generator_loss,
)

LAST_LAYER_PATH = ("decoder", "conv_out", "kernel")


def strip_lossvar(params):
    """Drop the KL variant's trainable output-logvar leaf (not a model param —
    torch keeps it on the LOSS module, contperceptual.py:20; we carry it in
    ``gen_params['lossvar']`` so one Adam covers encoder+decoder+logvar like
    the reference's optimizer 0, autoencoder.py:395-400)."""
    return {k: v for k, v in params.items() if k != "lossvar"}


class AEState(struct.PyTreeNode):
    """Both adversaries' params/opt plus the shared step counter."""

    step: jnp.ndarray
    gen_params: Any
    gen_opt: Any
    disc_params: Any
    disc_stats: Any
    disc_opt: Any


def create_ae_state(gen_params, disc_variables, gen_tx, disc_tx) -> AEState:
    return AEState(
        step=jnp.zeros((), jnp.int32),
        gen_params=gen_params,
        gen_opt=gen_tx.init(gen_params),
        disc_params=disc_variables["params"],
        disc_stats=disc_variables.get("batch_stats", {}),
        disc_opt=disc_tx.init(disc_variables["params"]),
    )


def ae_optimizers(lr: float):
    """Adam betas (0.5, 0.9) for both (reference autoencoder.py:164-171)."""
    return optax.adam(lr, b1=0.5, b2=0.9), optax.adam(lr, b1=0.5, b2=0.9)


def make_ae_train_step(model, cfg: VAELossConfig, gen_tx, disc_tx,
                       lpips=None, variant: str = "vq",
                       seed: int = 0) -> Callable:
    """One combined step = generator update then discriminator update on the
    same batch (the reference's optimizer_idx 0/1 alternation collapsed into a
    single program — one dispatch per batch through the tunnel).

    ``lpips`` is the LPIPS module or None (perceptual term off — e.g. no
    staged VGG weights); its params ride in as an argument.

    ``variant``: ``"vq"`` pairs a `VQModelInterface` with
    ``VQLPIPSWithDiscriminator`` semantics (reference autoencoder.py:135-158);
    ``"kl"`` pairs an `AutoencoderKL` with ``LPIPSWithDiscriminator``
    (autoencoder.py:356-378, contperceptual.py:45-110). The KL posterior noise
    is folded from ``seed`` + the step counter on device (torch draws from the
    global RNG per call) and reused for the discriminator pass — matching the
    reference, which reuses one sampled reconstruction for both optimizers.
    """

    if cfg.disc_conditional:
        # capability boundary: no STEDM config conditions the discriminator
        # (reference vqperceptual.py:117-122 asserts it off on this path too)
        raise NotImplementedError("disc_conditional is not supported")
    if variant not in ("vq", "kl"):
        raise ValueError(f"Unknown codec variant {variant!r}")
    disc = build_discriminator(cfg)

    def disc_apply(params, stats, x):
        logits, mut = disc.apply({"params": params, "batch_stats": stats}, x,
                                 train=True, mutable=["batch_stats"])
        return logits, mut["batch_stats"]

    def train_step(state: AEState, img: jnp.ndarray, lpips_params):
        lpips_apply = None
        if lpips is not None:
            lpips_apply = lambda a, b: lpips.apply({"params": lpips_params},
                                                   a, b)
        rng = jax.random.fold_in(jax.random.PRNGKey(seed), state.step)

        def gen_disc_apply(rec):
            # torch runs the discriminator in train mode inside the generator
            # step too (batch statistics); its stat updates are discarded —
            # running averages are eval-only.
            logits, _ = disc_apply(state.disc_params, state.disc_stats, rec)
            return logits

        # --- generator update (optimizer_idx==0: vqperceptual.py:115-149 /
        # contperceptual.py:64-92) ---
        if variant == "vq":
            def forward(p):
                return model.apply({"params": p}, img,
                                   method=model.training_recon)

            gen_loss_fn = vq_generator_loss(
                cfg, forward=forward, disc_apply=gen_disc_apply,
                lpips_apply=lpips_apply, last_layer_path=LAST_LAYER_PATH)
        else:
            def forward(p):
                return model.apply({"params": strip_lossvar(p)}, img, rng,
                                   method=model.training_recon)

            gen_loss_fn = kl_generator_loss(
                cfg, forward=forward, disc_apply=gen_disc_apply,
                lpips_apply=lpips_apply, last_layer_path=LAST_LAYER_PATH)
        (g_total, g_aux), grads = jax.value_and_grad(
            gen_loss_fn, has_aux=True)(state.gen_params, img, state.step)
        g_log, idx = g_aux if variant == "vq" else (g_aux, None)
        updates, gen_opt = gen_tx.update(grads, state.gen_opt,
                                         state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, updates)

        # --- discriminator update on the same batch, detached rec
        # (reference vqperceptual.py:151-167; autoencoder.py:149-156) ---
        rec = jax.lax.stop_gradient(forward(gen_params)[0])
        d_loss_fn = discriminator_loss(cfg, disc_apply=disc_apply)
        (d_total, (d_log, disc_stats)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.disc_params, state.disc_stats,
                                     img, rec, state.step)
        d_updates, disc_opt = disc_tx.update(d_grads, state.disc_opt,
                                             state.disc_params)
        disc_params = optax.apply_updates(state.disc_params, d_updates)

        log = {f"train/{k}": v for k, v in {**g_log, **d_log}.items()}
        if idx is not None:
            perplexity, cluster_use = measure_perplexity(idx, model.n_embed)
            log["train/perplexity"] = perplexity
            log["train/cluster_usage"] = cluster_use
        new_state = AEState(step=state.step + 1, gen_params=gen_params,
                            gen_opt=gen_opt, disc_params=disc_params,
                            disc_stats=disc_stats, disc_opt=disc_opt)
        return new_state, log, rec

    return train_step


def make_ae_eval_step(model, cfg: VAELossConfig, lpips=None,
                      variant: str = "vq") -> Callable:
    """Validation reconstruction metrics (the reference's validation_step,
    autoencoder.py:176-186 / :376-386: rec loss + aeloss log without optimizer
    churn). Deviation for ``variant="kl"``: the posterior is sampled with a
    FIXED key (torch re-draws from the global RNG each epoch), so the
    best-on-val checkpoint selection compares like against like."""

    def eval_step(gen_params, img: jnp.ndarray, lpips_params):
        from stedm_tpu.train.vae_losses import nll_terms

        lpips_apply = None
        if lpips is not None:
            lpips_apply = lambda a, b: lpips.apply({"params": lpips_params},
                                                   a, b)
        if variant == "vq":
            rec, emb_loss, idx = model.apply({"params": gen_params}, img,
                                             method=model.training_recon)
            rec_loss, p_loss = nll_terms(cfg, lpips_apply, img, rec)
            perplexity, cluster_use = measure_perplexity(idx, model.n_embed)
            return {"val/rec_loss": jnp.mean(rec_loss),
                    "val/quant_loss": jnp.mean(emb_loss),
                    "val/p_loss": jnp.mean(p_loss),
                    "val/perplexity": perplexity,
                    "val/cluster_usage": cluster_use}, rec
        rec, posterior = model.apply({"params": strip_lossvar(gen_params)},
                                     img, jax.random.PRNGKey(0),
                                     method=model.training_recon)
        rec_loss, p_loss = nll_terms(cfg, lpips_apply, img, rec)
        kl = posterior.kl()
        return {"val/rec_loss": jnp.mean(rec_loss),
                "val/kl_loss": jnp.sum(kl) / kl.shape[0],
                "val/p_loss": jnp.mean(p_loss)}, rec

    return eval_step
