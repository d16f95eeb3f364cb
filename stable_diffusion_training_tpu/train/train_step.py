"""The fused train step: VAE encode -> noise -> text encode -> UNet -> loss ->
grad -> Lion update -> EMA, traced into ONE XLA program.

Behavior parity with ``/root/reference/training_utils.py:504-762`` — the same
signature groups (donated states, batch+rng, unhashable-static frozen states,
hashable statics), the same rng split tree
(``dropout, sample, next = split(rng,3)`` then
``offset, noise, perturb, timestep = split(sample,4)`` — including the
reference's reuse of ``sample_rng`` both for the VAE sample and as the split
source), offset/perturbation noise, uniform per-sample timesteps, BOS/EOS
window stripping, epsilon/v targets, min-SNR-gamma rescale, and post-update
EMA.

TPU-first difference: the whole step runs NHWC (one transpose of the incoming
NCHW pixel batch). To stay bit-for-bit with the reference, every
``jax.random`` draw uses the reference's NCHW shapes and is transposed — the
values at each logical element are then identical, only the layout differs,
and the final scalar loss matches exactly.
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..utils.context import concat_context_windows


def compute_snrs(alphas_cumprod: jnp.ndarray) -> jnp.ndarray:
    return alphas_cumprod / (1 - alphas_cumprod)


def _unwrap(model_pred):
    return model_pred.sample if hasattr(model_pred, "sample") else model_pred


def train_step(
    # donated args
    unet_state: Any,
    text_encoder_state: Any,
    unet_ema_params: Optional[dict],
    text_encoder_ema_params: Optional[dict],
    # variable args
    batch: dict,
    train_rng: jax.Array,
    # unhashable static args (FrozenModel pytrees)
    frozen_vae_state: Any,
    frozen_noise_scheduler_state: Any,
    # hashable static args
    strip_bos_eos_token: bool = True,
    offset_noise_magnitude: float = 0.0,
    min_snr_gamma_magnitude: float = 0.0,
    perturbation_noise_magnitude: float = 0.0,
    ema_rate: float = 0.0,
    text_context_window: int = 77,
    grad_accumulation_steps: int = 1,
    train_text_encoder: bool = True,
    vae_encode_chunk: int = 0,
):
    """One optimization step. Returns
    ``(unet_state, text_encoder_state, unet_ema, text_ema, {"loss"}, next_rng)``
    in donation-compatible order (reference ``training_utils.py:749-762``).

    ``grad_accumulation_steps > 1`` (a capability the reference lacks,
    SURVEY.md §2.13) splits the batch into micro-batches scanned with
    per-micro rng splits, averages grads, and applies ONE optimizer update;
    the default of 1 keeps the reference's exact numerics.

    ``train_text_encoder=False`` freezes the text encoder (no grads, no
    update) — required for SDXL-scale frozen-TE runs (BASELINE config 5).

    If the batch carries precomputed VAE ``latent_moments`` (NCHW, 2*latent
    channels; see ``data.latent_cache``) the VAE encode is skipped — the
    offline-latent-cache fast path.

    ``vae_encode_chunk=n`` runs the frozen VAE encode via ``lax.map`` over
    micro-batches of n samples instead of one whole-batch call. The encode
    is per-sample independent (convs + per-sample GroupNorm), so the math
    is identical — bitwise on CPU (tests/test_train.py); on TPU the convs'
    internal accumulation order differs between batch tilings, so the low
    bits can move exactly as they do between any two XLA recompiles. It is
    an XLA-strategy lever: at 768² the whole-batch encode triggers f32
    spatially-partitioned convolutions with ~1.8 GB halo copies, while
    per-sample (n=1) keeps the fused bf16 pipeline — measured 2.2x faster
    VAE encode, +19%% end-to-end on BASELINE config 3 (PERF_NOTES round 3).
    0 = whole batch (default, reference behavior).
    """
    dropout_rng, sample_rng, new_train_rng = jax.random.split(train_rng, num=3)

    scheduler = frozen_noise_scheduler_state.call
    scheduler_state = frozen_noise_scheduler_state.params

    def compute_model_ema(ema_params, update_params):
        return jax.tree_util.tree_map(
            lambda leaf_ema, leaf_model: ema_rate * leaf_ema
            + (1 - ema_rate) * leaf_model,
            ema_params,
            update_params,
        )

    def min_snr_gamma_loss_rescale(loss, timesteps, gamma):
        """Attenuate late-timestep loss: weight = min(snr, gamma)/snr
        (epsilon) or min(snr, gamma)/(snr+1) (v-prediction)."""
        snrs = compute_snrs(scheduler_state.common.alphas_cumprod)
        snr = snrs[timesteps]
        min_snr_gamma = jnp.minimum(snr, gamma)
        if scheduler.config.prediction_type == "v_prediction":
            snr_weight = jnp.divide(min_snr_gamma, snr + 1).astype(jnp.float32)
        else:
            snr_weight = jnp.divide(min_snr_gamma, snr).astype(jnp.float32)
        return loss * snr_weight[:, None, None, None]

    def _compute_loss_with_rngs(
        unet_params,
        text_encoder_params,
        vae_params,
        noise_scheduler_state,
        batch,
        sample_rng,
        dropout_rng,
    ):
        # NCHW loader batch -> NHWC compute layout (single transpose)
        if "latent_moments" in batch:
            # offline VAE-latent cache fast path: moments precomputed
            from ..models.vae import DiagonalGaussianDistribution

            moments_nhwc = jnp.transpose(batch["latent_moments"], (0, 2, 3, 1))
            latent_dist = DiagonalGaussianDistribution(moments_nhwc, axis=-1)
        else:
            pixels_nhwc = jnp.transpose(batch["pixel_values"], (0, 2, 3, 1))
            if vae_encode_chunk:
                from ..models.vae import DiagonalGaussianDistribution

                bsz, hh, ww, cc = pixels_nhwc.shape
                n = vae_encode_chunk
                if bsz % n:
                    raise ValueError(
                        f"vae_encode_chunk={n} must divide batch size {bsz}"
                    )

                def _encode_moments(px):
                    d = frozen_vae_state.call.apply(
                        {"params": vae_params},
                        px,
                        deterministic=True,
                        method="encode",
                    ).latent_dist
                    # logvar was already clipped in the dist constructor;
                    # re-constructing from the concat re-clips (idempotent)
                    return jnp.concatenate([d.mean, d.logvar], axis=-1)

                moments = jax.lax.map(
                    _encode_moments, pixels_nhwc.reshape(bsz // n, n, hh, ww, cc)
                )
                latent_dist = DiagonalGaussianDistribution(
                    moments.reshape((bsz,) + moments.shape[2:]), axis=-1
                )
            else:
                vae_outputs = frozen_vae_state.call.apply(
                    {"params": vae_params},
                    pixels_nhwc,
                    deterministic=True,
                    method="encode",
                )
                latent_dist = vae_outputs.latent_dist
        # NHWC latent sample — same rng/shape as the reference's pre-transpose
        # sample (training_utils.py:582), so values match bit-for-bit
        latents = latent_dist.sample(sample_rng)
        latents = latents * 0.18215

        b, lh, lw, lc = latents.shape
        nchw = (b, lc, lh, lw)

        # reference splits the already-used sample_rng again (quirk, kept)
        noise_offset_rng, noise_rng, perturb_noise_rng, timestep_rng = (
            jax.random.split(key=sample_rng, num=4)
        )
        # draw in NCHW (reference shape) then transpose so values align
        noise = jnp.transpose(
            jax.random.normal(key=noise_rng, shape=nchw), (0, 2, 3, 1)
        )
        if offset_noise_magnitude:
            # per-channel mean offset (crosslabs offset-noise)
            noise_offset = (
                jax.random.normal(key=noise_offset_rng, shape=(b, lc, 1, 1))
                * offset_noise_magnitude
            )
            noise = noise + jnp.transpose(noise_offset, (0, 2, 3, 1))
        if perturbation_noise_magnitude:
            noise = noise + perturbation_noise_magnitude * jnp.transpose(
                jax.random.normal(perturb_noise_rng, nchw), (0, 2, 3, 1)
            )

        timesteps = jax.random.randint(
            key=timestep_rng,
            shape=(b,),
            minval=0,
            maxval=scheduler.config.num_train_timesteps,
        )

        noisy_latents = scheduler.add_noise(
            state=noise_scheduler_state,
            original_samples=latents,
            noise=noise,
            timesteps=timesteps,
        )

        if "encoder_hidden_states" in batch:
            # frozen-text-encoder fast path (BASELINE config 5 / SDXL at
            # real scale): the loader supplies the cross-attention context
            # precomputed offline — e.g. the SDXL dual-tower 2048-channel
            # concat from data.latent_cache.compute_encoder_hidden_states,
            # which the in-step (trainable-TE1-only) encode cannot produce.
            # Use with train_text_encoder=False; TE grads are zero here.
            encoder_hidden_states = batch["encoder_hidden_states"]
        else:
            encoder_hidden_states = text_encoder_state.apply_fn(
                params=text_encoder_params,
                input_ids=batch["input_ids"],
                dropout_rng=dropout_rng,
                train=True,
            )[0]
            # (batch*concat, win, dim) -> (batch, concat, win, dim)
            encoder_hidden_states = jnp.reshape(
                encoder_hidden_states,
                (b, -1, text_context_window, encoder_hidden_states.shape[-1]),
            )

            # window0 minus EOS + middle windows minus both + last window
            # minus BOS (shared definition: utils/context.py)
            encoder_hidden_states = concat_context_windows(
                encoder_hidden_states, strip_bos_eos_token
            )

        # SDXL micro-conditioning: the loader supplies pooled text embeds
        # (from the frozen second text encoder, typically precomputed
        # alongside the latent cache) and per-sample size/crop time_ids
        unet_kwargs = {}
        if "pooled_text_embeds" in batch:
            unet_kwargs["added_cond_kwargs"] = {
                "text_embeds": batch["pooled_text_embeds"],
                "time_ids": batch["time_ids"],
            }

        model_pred = _unwrap(
            unet_state.apply_fn(
                {"params": unet_params},
                noisy_latents,
                timesteps,
                encoder_hidden_states,
                train=True,
                rngs={"dropout": dropout_rng},
                **unet_kwargs,
            )
        )

        if scheduler.config.prediction_type == "epsilon":
            target = noise
        elif scheduler.config.prediction_type == "v_prediction":
            target = scheduler.get_velocity(
                state=noise_scheduler_state,
                sample=latents,
                noise=noise,
                timesteps=timesteps,
            )
        else:
            raise ValueError(
                f"Unknown prediction type {scheduler.config.prediction_type}"
            )

        loss = (target - model_pred) ** 2
        if min_snr_gamma_magnitude:
            loss = min_snr_gamma_loss_rescale(
                loss, timesteps, min_snr_gamma_magnitude
            )
        return loss.mean()

    def compute_loss(
        unet_params, text_encoder_params, vae_params, noise_scheduler_state, batch
    ):
        return _compute_loss_with_rngs(
            unet_params,
            text_encoder_params,
            vae_params,
            noise_scheduler_state,
            batch,
            sample_rng,
            dropout_rng,
        )

    diff_argnums = [0, 1] if train_text_encoder else [0]
    grad_fn = jax.value_and_grad(fun=compute_loss, argnums=diff_argnums)
    if grad_accumulation_steps <= 1:
        loss, grad = grad_fn(
            unet_state.params,
            text_encoder_state.params,
            frozen_vae_state.params,
            frozen_noise_scheduler_state.params,
            batch,
        )
    else:
        accum = grad_accumulation_steps
        # batch size from whichever image key the loader supplies (pixels,
        # or latent moments on the offline-cache path)
        image_key = (
            "pixel_values" if "pixel_values" in batch else "latent_moments"
        )
        total_b = batch[image_key].shape[0]
        if total_b % accum:
            raise ValueError(
                f"batch size {total_b} not divisible by "
                f"grad_accumulation_steps={accum}"
            )
        micro_b = total_b // accum

        def _split_leaf(leaf):
            # leading dims are batch-derived (pixel_values B; ids B*concat)
            per = leaf.shape[0] // accum
            return leaf.reshape(accum, per, *leaf.shape[1:])

        micro_batches = jax.tree_util.tree_map(_split_leaf, batch)
        micro_rngs = jax.random.split(sample_rng, accum)
        micro_dropout = jax.random.split(dropout_rng, accum)

        def micro_step(carry, xs):
            loss_acc, grad_acc = carry
            mb, s_rng, d_rng = xs

            def micro_loss(unet_p, te_p):
                return _compute_loss_with_rngs(
                    unet_p, te_p, frozen_vae_state.params,
                    frozen_noise_scheduler_state.params, mb, s_rng, d_rng,
                )

            l, g = jax.value_and_grad(micro_loss, argnums=diff_argnums)(
                unet_state.params, text_encoder_state.params
            )
            grad_acc = jax.tree_util.tree_map(
                lambda a, b: a + b / accum, grad_acc, tuple(g)
            )
            return (loss_acc + l / accum, grad_acc), None

        diff_params = (unet_state.params, text_encoder_state.params)[
            : len(diff_argnums)
        ]
        zero_grads = tuple(
            jax.tree_util.tree_map(
                lambda x: jnp.zeros_like(x, dtype=jnp.float32), p
            )
            for p in diff_params
        )
        (loss, grad), _ = jax.lax.scan(
            micro_step,
            (jnp.zeros((), jnp.float32), zero_grads),
            (micro_batches, micro_rngs, micro_dropout),
        )
        # back to param dtype (accumulation runs in f32 for stability)
        grad = [
            jax.tree_util.tree_map(
                lambda g, p: g.astype(p.dtype), g_tree, params
            )
            for g_tree, params in zip(grad, diff_params)
        ]

    new_unet_state = unet_state.apply_gradients(grads=grad[0])
    if train_text_encoder:
        new_text_encoder_state = text_encoder_state.apply_gradients(grads=grad[1])
    else:
        new_text_encoder_state = text_encoder_state

    if ema_rate and unet_ema_params is not None:
        new_unet_ema_params = compute_model_ema(
            unet_ema_params, new_unet_state.params
        )
    else:
        new_unet_ema_params = None
    if ema_rate and text_encoder_ema_params is not None:
        new_text_encoder_ema_params = compute_model_ema(
            text_encoder_ema_params, new_text_encoder_state.params
        )
    else:
        new_text_encoder_ema_params = None

    metrics = {"loss": loss}
    return (
        new_unet_state,
        new_text_encoder_state,
        new_unet_ema_params,
        new_text_encoder_ema_params,
        metrics,
        new_train_rng,
    )
