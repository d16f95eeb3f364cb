"""Training configuration.

API parity with ``TrainingConfig`` at ``/root/reference/training_utils.py:52-113``
(all 29 fields, same names) plus the load pattern at
``/root/reference/training.py:38-40`` — the raw JSON dict carries ~20 extra
run-state keys (repos, chunking, resume counters) and only the dataclass-field
subset builds the typed config.

Dead/ignored fields preserved for compatibility (SURVEY.md §2.2):
``lr_scheduler`` (only constant implemented), ``aot_compile`` (never read),
``learning_rate``; the reference also does NOT forward
``unet_learning_rate``/``text_encoder_learning_rate``/
``adam_to_lion_scale_factor`` into the optimizer — see
``on_device_model_training_state``. New fields added here (all defaulted so
reference configs load unchanged) are marked "new".
"""

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional


@dataclass
class TrainingConfig:
    model_path: str
    batch_size: int
    learning_rate: float
    unet_learning_rate: float
    text_encoder_learning_rate: float
    lr_scheduler: str
    adam_to_lion_scale_factor: float
    compilation_cache_path: str
    keep_compiled_fn_in_cache: bool
    text_encoder_context_window: int
    context_window_concatenation_count: int
    aot_compile: bool
    strip_bos_eos_token: bool
    offset_noise_magnitude: float
    min_snr_gamma_magnitude: float
    perturbation_noise_magnitude: float
    image_area_root: List[int]
    minimum_axis_length: List[int]
    beta_scheduler: str
    prediction_type: str
    excluded_layer_pattern_from_weight_decay: List[str]
    excluded_layer_from_quantization: List[str]
    quant_block_size: int
    quantize_unet_state: bool
    quantize_text_encoder_state: bool
    accumulate_unet_ema: bool
    accumulate_text_encoder_ema: bool
    ema_rate: float

    # --- new (TPU-native) fields, defaulted for reference-config compat ------
    model_family: str = "sd15"  # architecture family when building fresh models
    mesh_shape: Optional[List[int]] = None  # None -> (device_count, 1) pure DP
    mesh_axis_names: Optional[List[str]] = None
    fsdp_shard_params: bool = False  # ZeRO-style param sharding on "fsdp" axis
    tensor_parallel_shard_params: bool = False  # Megatron TP on "model_parallel"
    gradient_checkpointing: bool = False
    # remat ONLY the transformer feed-forward (GEGLU) blocks: frees their
    # (B, S, 4*dim) saved intermediates for two extra matmuls of recompute —
    # the cheap middle ground between no remat and full-block
    # gradient_checkpointing for batches that almost fit HBM
    ff_gradient_checkpointing: bool = False
    train_unet: bool = True
    train_text_encoder: bool = True
    mixed_precision: str = "bfloat16"  # computation dtype for the models
    attention_backend: str = "auto"  # "auto" | "flash" | "xla"
    # compute the VAE encoder's stride-2 downsample convs as four stride-1
    # polyphase convs (ops.conv) — same 9 taps, f32-accumulated either way,
    # allclose but not bitwise vs the fused stride-2 form. Off: the on-chip
    # A/B (benchmarks/downsample_poly_ab.py) measured it 1.5-2.8x SLOWER
    # (phase-slice extraction dominates); kept as a recorded negative.
    vae_polyphase_downsample: bool = False
    # route quantized momentum through the fused Pallas kernel; None = auto
    # (on for TPU backends). False gives the reference-style XLA-fused path.
    use_pallas_lion: Optional[bool] = None
    # quantized leaves with at most this many blocks update in ONE packed
    # kernel dispatch per layout (bitwise-identical; 65536 = bucket <=1M-elem
    # leaves). Default decided on-chip (benchmarks/lion_bucket_ab.py, v5e
    # 2026-08-18): bucketing 2.1x faster on the isolated small-leaf
    # population (27.3 -> 13.0 ms) and -9 ms/step on the SD1.5-512 headline
    # (p50 684.5 -> 675.6 ms) — the concat/split copies cost less than the
    # ~200 saved dispatch overheads. 0 disables (per-leaf dispatches).
    lion_bucket_max_nb: int = 65536
    # 8-bit Lion compander math: "exact" reproduces the reference's
    # 5th-power compander op-for-op (bitwise vs lion_quant.py); "fast" is
    # the opt-in reassociated form with fewer full-width VPU ops (folded
    # /127 constant, reciprocal-multiply instead of divide) — NOT bitwise
    # vs exact (ulp-level), training-equivalent (golden loss-curve
    # tested). See optim.lion8bit.scale_by_lion_8bit.
    lion_compander: str = "exact"
    # momentum storage layout: "auto" (default — the framework's dense /
    # block-transposed TPU layouts, chosen per leaf) or "reference" (the
    # reference's own (n_blocks, block_size) order, lion_quant.py:66-92 —
    # the STRICT-FAITHFUL benchmark anchor; jnp path + exact compander only)
    lion_momentum_layout: str = "auto"
    # the reference ignores the configured learning rates and scale factor
    # (on_device_model_training_state hardcodes scale 7 and the 1e-6 LR
    # defaults — training_utils.py:432-442) and implements only a constant
    # schedule. honor_learning_rates=True forwards the configured
    # unet/text LRs + adam_to_lion_scale_factor and enables real schedules
    # via lr_scheduler: "constant" | "cosine" | "warmup_cosine" with
    # lr_warmup_steps / lr_decay_steps. Default False = exact reference.
    honor_learning_rates: bool = False
    lr_warmup_steps: int = 0
    lr_decay_steps: int = 0
    seed_init: int = 0  # rng for fresh-family init
    grad_accumulation_steps: int = 1  # micro-batch accumulation (1 = off)
    use_latent_cache: bool = False  # batches carry latent_moments, VAE skipped
    # VAE encode micro-batch size (0 = whole batch). Per-sample (1) flips
    # XLA away from f32 spatially-partitioned convs at >=768² — 2.2x faster
    # encode, bitwise-identical moments (train_step docstring, PERF_NOTES)
    vae_encode_chunk: int = 0
    cached_text_context: bool = False  # batches carry encoder_hidden_states
    # (precomputed frozen-tower context, data.latent_cache); pair with
    # train_text_encoder=False
    sdxl_micro_conditioning: bool = False  # batches carry pooled embeds+time_ids
    # number of micro-conditioning time ids: 6 for the SDXL base model
    # (size/crop/target), 5 for the refiner (size/crop/aesthetic-score)
    sdxl_time_ids_count: int = 6
    # step-level H2D prefetch depth: how many batches keep their async
    # device_put in flight ahead of the executing step (the reference's
    # numb_of_prefetched_batch controls CHUNK prefetch, not this). Depth >1
    # rides out loader queue-timeout hiccups without stalling the UNet.
    device_prefetch_depth: int = 1
    # bucket grid step. 64 = the reference grid (training_utils.py:134-174);
    # raising it (e.g. 128) quarters the number of aspect-ratio buckets and
    # therefore the number of AOT-compiled XLA programs, at slightly coarser
    # aspect fitting — the compile-count lever for large multi-tier configs
    bucket_rounding: int = 64

    def __post_init__(self):
        if self.cached_text_context and self.train_text_encoder:
            # zero grads + Lion weight decay would silently decay the
            # "trainable" TE toward zero while conditioning comes from the
            # stale precomputed context — never a sane combination
            raise ValueError(
                "cached_text_context=True requires train_text_encoder=False "
                "(the precomputed context bypasses the text encoder; "
                "training it would only apply weight decay to unused params)"
            )
        if self.vae_encode_chunk and self.batch_size % self.vae_encode_chunk:
            raise ValueError(
                f"vae_encode_chunk={self.vae_encode_chunk} must divide "
                f"batch_size={self.batch_size} (the encode is lax.map'd "
                "over whole micro-batches)"
            )

    def replace(self, **kwargs) -> "TrainingConfig":
        return dataclasses.replace(self, **kwargs)


_FIELD_NAMES = {f.name for f in dataclasses.fields(TrainingConfig)}
_REQUIRED = {
    f.name
    for f in dataclasses.fields(TrainingConfig)
    if f.default is dataclasses.MISSING and f.default_factory is dataclasses.MISSING
}


def training_config_from_dict(config_dict: Dict[str, Any]) -> TrainingConfig:
    """Build the typed config from the raw JSON dict, keeping only dataclass
    fields — the exact subset rule at ``/root/reference/training.py:38-40``."""
    missing = _REQUIRED - set(config_dict)
    if missing:
        raise KeyError(f"model_properties config missing keys: {sorted(missing)}")
    subset = {k: v for k, v in config_dict.items() if k in _FIELD_NAMES}
    return TrainingConfig(**subset)
