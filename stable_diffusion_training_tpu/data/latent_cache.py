"""Offline VAE-latent caching (BASELINE config 5).

For frozen-VAE training the encoder output never changes, so the pixel
decode + VAE encode can run once offline; the train step then consumes the
cached posterior *moments* (mean/logvar, 2x latent channels) and still draws
a fresh latent sample per step with its own rng — identical training
distribution to on-the-fly encoding, at a fraction of the step cost and
with 8x less loader bandwidth than pixels (per 512² image: 64²x8 f32 vs
512²x3 f32).

Cached batches carry ``latent_moments`` (NCHW) instead of ``pixel_values``;
``train_step`` detects the key and skips the VAE (train/train_step.py).
"""

import functools
import os
from typing import Dict, Iterable, List

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.context import concat_context_windows


def encode_batch_to_moments(
    vae, vae_params, pixel_values_nchw, chunk: int = 0
) -> np.ndarray:
    """Run the VAE encoder on an NCHW pixel batch; returns NCHW moments.

    ``chunk=n`` lax.map's the encode in micro-batches of n — the same
    XLA-strategy lever as ``train_step``'s ``vae_encode_chunk`` (at >=768²
    whole-batch encodes trigger f32 spatially-partitioned convolutions,
    2.2x slower than per-sample; PERF_NOTES round 3). Default 0 resolves
    to per-sample when the spatial size is >= 768, else whole-batch."""
    nhwc = getattr(vae, "data_format", "NCHW") == "NHWC"
    if chunk == 0:
        chunk = 1 if max(pixel_values_nchw.shape[-2:]) >= 768 else None

    @jax.jit
    def _encode(px):
        x = jnp.transpose(px, (0, 2, 3, 1)) if nhwc else px

        def _one(xi):
            out = vae.apply({"params": vae_params}, xi, deterministic=True,
                            method="encode")
            dist = out.latent_dist
            axis = -1 if nhwc else 1
            return jnp.concatenate([dist.mean, dist.logvar], axis=axis)

        if chunk:
            bsz = x.shape[0]
            if bsz % chunk:
                moments = _one(x)
            else:
                m = jax.lax.map(
                    _one, x.reshape((bsz // chunk, chunk) + x.shape[1:])
                )
                moments = m.reshape((bsz,) + m.shape[2:])
        else:
            moments = _one(x)
        if nhwc:
            moments = jnp.transpose(moments, (0, 3, 1, 2))
        return moments

    return np.asarray(_encode(jnp.asarray(pixel_values_nchw)))


def sdxl_time_ids(
    batch_size: int,
    original_size,
    crop_coords,
    target_size,
    aesthetic_score=None,
) -> np.ndarray:
    """SDXL micro-conditioning ids. Base model: ``(B, 6)``
    (orig_h, orig_w, crop_top, crop_left, target_h, target_w). With
    ``aesthetic_score`` set (refiner training): ``(B, 5)``
    (orig_h, orig_w, crop_top, crop_left, aesthetic_score)."""
    if aesthetic_score is not None:
        row = np.array(
            [[*original_size, *crop_coords, float(aesthetic_score)]],
            dtype=np.float32,
        )
        return np.broadcast_to(row, (batch_size, 5)).copy()
    row = np.array(
        [[*original_size, *crop_coords, *target_size]], dtype=np.float32
    )
    return np.broadcast_to(row, (batch_size, 6)).copy()


@functools.partial(jax.jit, static_argnums=(0, 3))
def _encode_context_one_tower(text_encoder, te_params, ids_2d, penultimate):
    """Per-tower window encode: (N, win) ids -> (N, win, dim) hidden states,
    optionally the penultimate hidden layer (SDXL convention).

    Uses ``last_hidden_state`` by name: for CLIPTextModelWithProjection,
    ``out[0]`` is the pooled ``text_embeds``, not the token states."""
    out = text_encoder(
        ids_2d, params=te_params, output_hidden_states=penultimate
    )
    return out.hidden_states[-2] if penultimate else out.last_hidden_state


def compute_encoder_hidden_states(
    text_encoder,
    te_params,
    input_ids,
    concat_count: int = 1,
    context_window: int = 77,
    text_encoder_2=None,
    te2_params=None,
    strip_bos_eos_token: bool = True,
    penultimate: bool = False,
    input_ids_2=None,
) -> np.ndarray:
    """Precompute the UNet cross-attention context with FROZEN text towers.

    Single tower: identical math to the in-step encode (77-token windows,
    BOS/EOS-strip window concat — ``train_step.py``). With
    ``text_encoder_2``, the two towers' per-token hidden states are
    concatenated on the FEATURE axis after the window concat — SDXL's
    768+1280=2048-channel context, which the fused step cannot produce
    in-line (it only carries the trainable first tower, SURVEY.md §2.7).
    ``penultimate=True`` selects each tower's second-to-last hidden layer
    (the SDXL convention).

    Canonical SDXL tokenizes the prompt separately per tower (the two
    tokenizers pad differently: tokenizer_2 pads with id 0, tokenizer_1
    with EOS); pass ``input_ids_2`` for exact parity with checkpoints
    trained that way — without it, tower 2 reuses ``input_ids``.

    Feed the result as ``batch["encoder_hidden_states"]`` with
    ``train_text_encoder=False`` (BASELINE config 5)."""
    ids = np.asarray(input_ids)
    if ids.ndim == 3:  # (B, concat, win)
        ids = ids.reshape(-1, ids.shape[-1])
    elif ids.ndim == 2 and ids.shape[1] > context_window:
        ids = ids.reshape(-1, context_window)
    if ids.shape[0] % concat_count:
        raise ValueError(
            f"{ids.shape[0]} id rows do not group into concat_count="
            f"{concat_count} windows per sample"
        )

    def _strip_concat(h):  # (B*concat, win, dim) -> (B, tokens, dim)
        b = h.shape[0] // concat_count
        h = h.reshape(b, concat_count, h.shape[-2], h.shape[-1])
        # the in-step path uses the SAME function (utils/context.py), so
        # cached and in-line conditioning cannot diverge
        return np.asarray(concat_context_windows(h, strip_bos_eos_token))

    jids = jnp.asarray(ids, jnp.int32)
    towers = [
        _strip_concat(
            np.asarray(
                _encode_context_one_tower(
                    text_encoder, te_params, jids, penultimate
                )
            )
        )
    ]
    if text_encoder_2 is not None:
        if input_ids_2 is not None:
            ids2 = np.asarray(input_ids_2)
            if ids2.ndim == 3:
                ids2 = ids2.reshape(-1, ids2.shape[-1])
            elif ids2.ndim == 2 and ids2.shape[1] > context_window:
                ids2 = ids2.reshape(-1, context_window)
            jids2 = jnp.asarray(ids2, jnp.int32)
        else:
            jids2 = jids
        towers.append(
            _strip_concat(
                np.asarray(
                    _encode_context_one_tower(
                        text_encoder_2, te2_params, jids2, penultimate
                    )
                )
            )
        )
    return np.concatenate(towers, axis=-1) if len(towers) > 1 else towers[0]


@functools.partial(jax.jit, static_argnums=(0,))
def _pool_text_embeds(text_encoder_2, te2_params, window_ids):
    # module-level jit: cache_batches_to_dir calls once per batch; a
    # closure-local @jax.jit would recompile the TE2 forward every call
    return text_encoder_2(window_ids, params=te2_params).text_embeds


def compute_pooled_text_embeds(
    text_encoder_2, te2_params, input_ids, context_window: int = 77
) -> np.ndarray:
    """Pooled/projected embeds from the frozen second text encoder (SDXL's
    ``text_embeds`` micro-conditioning), shape ``(B, projection_dim)``.

    SDXL pools from the FIRST 77-token window of each sample only (both
    SDXL tokenizers share the CLIP BPE vocab). Accepts ids as ``(B, win)``
    (already first-window), ``(B, concat*win)``, or ``(B, concat, win)``;
    a flat ``(B*concat, win)`` batch is ambiguous — reshape it to one of
    the above at the call site."""
    ids = np.asarray(input_ids)
    if ids.ndim == 3:
        ids = ids[:, 0, :]
    elif ids.ndim == 2 and ids.shape[1] > context_window:
        if ids.shape[1] % context_window:
            raise ValueError(
                f"ids width {ids.shape[1]} is not a multiple of the "
                f"{context_window}-token window"
            )
        ids = ids.reshape(ids.shape[0], -1, context_window)[:, 0, :]
    return np.asarray(
        _pool_text_embeds(text_encoder_2, te2_params, jnp.asarray(ids, jnp.int32))
    )


def cache_batches_to_dir(
    batches: Iterable[Dict[str, np.ndarray]],
    vae,
    vae_params,
    cache_dir: str,
    text_encoder_2=None,
    te2_params=None,
    context_window: int = 77,
    aesthetic_score=None,
    text_encoder=None,
    te_params=None,
    concat_count: int = 1,
    strip_bos_eos_token: bool = True,
    penultimate: bool = False,
    context_use_tower_2: bool = True,
) -> List[str]:
    """Offline pass: encode every batch's pixels, write npz shards.

    With ``text_encoder_2`` given, each shard also carries the SDXL
    micro-conditioning (``pooled_text_embeds`` from the frozen second tower +
    size/crop ``time_ids``), making BASELINE config 5 runnable straight from
    the trainer (the train step consumes these keys,
    ``train/train_step.py``). ``aesthetic_score`` switches the time ids to
    the refiner's 5-element (size/crop/aesthetic) form.

    With ``text_encoder`` ALSO given, shards carry the fully-precomputed
    frozen cross-attention context (``encoder_hidden_states`` — the SDXL
    dual-tower feature concat when both towers are present), so the train
    step skips text encoding entirely (``train_text_encoder=False``)."""
    os.makedirs(cache_dir, exist_ok=True)
    paths = []
    for i, batch in enumerate(batches):
        moments = encode_batch_to_moments(vae, vae_params, batch["pixel_values"])
        extras = {}
        if text_encoder_2 is not None:
            b, _, h, w = batch["pixel_values"].shape
            # first 77-token window per sample is the pooled source
            first_windows = np.asarray(batch["input_ids"]).reshape(
                b, -1, context_window
            )[:, 0, :]
            extras["pooled_text_embeds"] = compute_pooled_text_embeds(
                text_encoder_2, te2_params, first_windows, context_window
            )
            extras["time_ids"] = sdxl_time_ids(
                b, (h, w), (0, 0), (h, w), aesthetic_score=aesthetic_score
            )
        if text_encoder is not None:
            # context_use_tower_2=False gives a single-tower context even
            # when TE2 is present for the pooled micro-conditioning (e.g.
            # frozen-TE SD1.x where the UNet is TE1-width)
            extras["encoder_hidden_states"] = compute_encoder_hidden_states(
                text_encoder,
                te_params,
                batch["input_ids"],
                concat_count=concat_count,
                context_window=context_window,
                text_encoder_2=text_encoder_2 if context_use_tower_2 else None,
                te2_params=te2_params if context_use_tower_2 else None,
                strip_bos_eos_token=strip_bos_eos_token,
                penultimate=penultimate,
            )
        path = os.path.join(cache_dir, f"latents_{i:06d}.npz")
        np.savez(
            path,
            latent_moments=moments,
            input_ids=batch["input_ids"],
            attention_mask=batch["attention_mask"],
            **extras,
        )
        paths.append(path)
    return paths


class CachedLatentLoader:
    """Streamer-protocol loader over an offline latent cache directory."""

    def __init__(self, cache_dir: str):
        self.cache_dir = cache_dir
        self._paths = sorted(
            os.path.join(cache_dir, f)
            for f in os.listdir(cache_dir)
            if f.endswith(".npz")
        )
        self._cursor = 0
        self._print_debug = False
        self.chunk_number = 0
        self._bulk_batch_count = len(self._paths)
        self._first_batch_count = 0

    # --- streamer protocol ---------------------------------------------------
    def delete_prev_chunks(self, prev_chunk: int) -> None:
        pass

    def grab_and_prefetch_chunk(self, numb_of_prefetched_batch: int = 1) -> None:
        pass

    def prepare_training_dataframe(self) -> None:
        pass

    def create_training_dataframe(self) -> None:
        pass

    def dispatch_worker(self) -> None:
        self._cursor = 0

    def grab_next_batch(self):
        if self._cursor >= len(self._paths):
            return "end_of_batch"
        with np.load(self._paths[self._cursor]) as z:
            batch = {k: z[k] for k in z.files}
        self._cursor += 1
        return batch


def precompute_latent_cache(
    pixel_loader,
    vae,
    vae_params,
    cache_dir: str,
    text_encoder_2=None,
    te2_params=None,
    context_window: int = 77,
    aesthetic_score=None,
    **context_kwargs,
) -> CachedLatentLoader:
    """Drain a pixel loader through the VAE (and optionally the frozen SDXL
    second text encoder) into a cache; return the cached loader.
    ``context_kwargs`` (text_encoder/te_params/concat_count/...) forward to
    ``cache_batches_to_dir`` for frozen-tower context precompute."""

    def _batches():
        pixel_loader.dispatch_worker()
        while True:
            b = pixel_loader.grab_next_batch()
            if isinstance(b, str):
                return
            if b is None:
                continue
            yield b

    cache_batches_to_dir(
        _batches(),
        vae,
        vae_params,
        cache_dir,
        text_encoder_2=text_encoder_2,
        te2_params=te2_params,
        context_window=context_window,
        aesthetic_score=aesthetic_score,
        **context_kwargs,
    )
    return CachedLatentLoader(cache_dir)
