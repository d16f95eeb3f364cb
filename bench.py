"""Benchmark: SD1.5 fused train step (fwd+bwd+8bit-Lion+EMA), bf16.

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}``

Primary metric (BASELINE.md): training images/sec/chip, SD1.5 UNet at 512².
The reference publishes no numbers (``BASELINE.json`` ``published: {}``) and
cannot run here (no diffusers / no egress), so ``vs_baseline`` is anchored to
a **reference-style leg measured in the same session**: the same fused train
step computed the way the patched reference computes it — exact single-chunk
XLA attention (what ``key_chunk_patch.patch`` reduces diffusers'
memory-efficient attention to, SURVEY.md §2.12) and the XLA-fused jnp 8-bit
Lion (``/root/reference/lion_quant.py`` semantics) instead of the Pallas
kernels. Same-session ratios are the only meaningful comparison on this rig
(throughput varies between sessions — PERF_NOTES.md).

Also reported:
- ``p50_step_time_s``: true median over timed groups of chained steps (keeps
  the async-dispatch pipelining of real training, unlike per-step syncs);
- ``mfu``: model FLOPs utilization — XLA's own cost analysis of the compiled
  step (covers VAE+CLIP+UNet fwd/bwd + optimizer) divided by wall-clock x
  chip peak (BASELINE.md north star is >=95% MXU utilization on the UNet);
- ``ref_style_*``: the reference-style leg's numbers.

Env overrides: BENCH_BATCH (default 16 — the best measured operating point
on v5e with the dense-Lion stack: 24.09 img/s/chip MFU 40.9%, vs
24.00/40.7% at 15 and 22.58/39.7% at 20, PERF_NOTES round 3; the round-2
stack OOMed at 16 — the query-chunked cross-attention remat is what made
batch >= 16 compile), BENCH_RES (default 512),
BENCH_STEPS (default 10), BENCH_FAMILY (default sd15), BENCH_SKIP_REF=1
(skip the reference-style leg; vs_baseline then falls back to the recorded
round-1 anchor), BENCH_BASELINE (override that anchor),
BENCH_PEAK_TFLOPS (chip peak override, bf16 TFLOP/s), BENCH_SKIP_PEAK=1
(skip the measured-achievable probe), BENCH_CONFIGS="3,4,5"|"all" (run the
BASELINE config legs live and print one JSON line each; otherwise the
recorded values ride along in the headline record), BENCH_GRAD_CKPT=1 /
BENCH_FF_REMAT=1 (remat variants), BENCH_ATTN (attention backend override).

Process model: every leg (headline ladder attempt, anchors, device probes,
config legs) runs in its OWN child process (``bench.py --one-leg <json>``),
sharing compiles via the persistent cache. Two reasons, both measured on
this rig (2026-08-19): an oversized SDXL compile can crash the relay's
tpu_compile_helper and poison every later attempt in the same process, and
the tunneled platform serializes chip claims across processes, so the
orchestrating parent must never claim the TPU itself. BENCH_SUBPROC=0
restores the old in-process mode; BENCH_ATTEMPT_TIMEOUT_S /
BENCH_HEADLINE_TIMEOUT_S bound each child.
"""

import json
import os
import time

import jax
import numpy as np

# images/sec/chip recorded for this benchmark's first honest (value-synced)
# round-1 run on the target chip (v5e, SD1.5 512² batch 8 bf16: p50 717ms);
# fallback anchor when the reference-style leg is skipped.
RECORDED_BASELINE = float(os.environ.get("BENCH_BASELINE", "0")) or 11.2

# BASELINE.md configs 3-5, last measured on this rig (v5e via axon —
# PERF_NOTES.md; config-3 is the round-4 FF-remat-b8 remat-ladder winner,
# the others are the round-3 captures). FALLBACK ONLY: by default the bench
# now re-runs these legs live within BENCH_TIME_BUDGET_S and embeds the
# fresh numbers in the headline record ("fresh": true); a leg that doesn't
# fit the budget or fails falls back to its entry here, marked
# "fresh": false with its capture date.
RECORDED_CONFIG_LEGS = {
    "3_sd21_768": {"images_per_sec_per_chip": 8.77, "batch_size": 8,
                   "mfu": 0.353, "ff_remat": True,
                   "recorded_on": "2026-08-19"},
    # b4 (3.01 img/s, MFU 41.6%, 2026-08-17 — the recommended recipe's
    # operating point) OOM'd at runtime under 2026-08-19 co-tenant HBM
    # pressure; the ladder landed at b2 that day
    "4_sdxl_1024_gradckpt_cached": {"images_per_sec_per_chip": 2.48,
                                    "batch_size": 2, "mfu": 0.325,
                                    "recorded_on": "2026-08-19"},
    "5_sdxl_1024_cached": {"images_per_sec_per_chip": 2.87,
                           "batch_size": 2, "mfu": 0.315,
                           "recorded_on": "2026-08-19"},
}

# bf16 peak TFLOP/s per chip by device kind substring
_PEAK_TFLOPS = (
    ("v6", 918.0),  # Trillium
    ("v5p", 459.0),
    ("v5", 197.0),  # v5e / "TPU v5 lite"
    ("v4", 275.0),
    ("v3", 123.0),
    ("v2", 45.0),
)


def _chip_peak_flops() -> float:
    override = float(os.environ.get("BENCH_PEAK_TFLOPS", "0"))
    if override:
        return override * 1e12
    kind = jax.devices()[0].device_kind.lower()
    for key, tflops in _PEAK_TFLOPS:
        if key in kind:
            return tflops * 1e12
    return 0.0


def _measured_peak_flops(dim: int = 4096, chained: int = 48) -> float:
    """The chip's ACHIEVABLE bf16 matmul rate, measured in-session.

    This rig's shared/tunneled chip runs far below nominal spec and varies
    between sessions (PERF_NOTES.md), so nominal-peak MFU understates kernel
    quality; `mfu_vs_measured` divides by this same-session ceiling instead.
    The chain must be LONG (multi-TFLOP per dispatch, comparable to a train
    step) — short dispatches get a worse queue share through the relay and
    under-estimate the ceiling. Best of 3 trials; float() forces the device
    sync the relay would otherwise skip."""
    import jax.numpy as jnp
    from jax import lax

    a = jnp.ones((dim, dim), jnp.bfloat16)
    b = jnp.ones((dim, dim), jnp.bfloat16)

    @jax.jit
    def chain(a, b):
        def body(_, x):
            return (x @ b) * (1.0 / dim)  # keep values bounded

        return lax.fori_loop(0, chained, body, a)

    _ = float(chain(a, b)[0, 0])  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(chain(a, b)[0, 0])
        best = min(best, time.perf_counter() - t0)
    return 2.0 * dim * dim * dim * chained / best


def _measured_conv_tflops() -> float:
    """Achievable bf16 CONV rate (TF/s) via a chained stride-1 3x3 conv.

    The round-4 per-kernel audit found the step's conv fusions sustain
    ~190 TF/s — well above the 4096^3 matmul chain's ~105 — so the matmul
    probe alone understates what the chip demonstrably delivers on this
    workload's dominant MXU shape. Reported alongside it; marginal
    differencing cancels the relay floor."""
    import jax.numpy as jnp
    from jax import lax

    x = jnp.ones((16, 256, 256, 128), jnp.bfloat16)
    w = jnp.full((3, 3, 128, 128), 0.01, jnp.bfloat16)

    def mk(reps):
        @jax.jit
        def f(x, w):
            def body(_, x):
                y = lax.conv_general_dilated(
                    x, w, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                return (y * jnp.bfloat16(0.05)).astype(jnp.bfloat16)

            return lax.fori_loop(0, reps, body, x)

        return f

    def timed(fn):
        _ = float(fn(x, w).reshape(-1)[0])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(x, w)
            _ = float(out.reshape(-1)[0])
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = timed(mk(4)), timed(mk(12))
    per_conv = max((t_hi - t_lo) / 8, 1e-9)
    flops = 2.0 * 16 * 256 * 256 * 128 * (3 * 3 * 128)
    return flops / per_conv / 1e12


def _measured_hbm_bandwidth(mb: int = 256) -> float:
    """Achievable HBM streaming bandwidth (GB/s), by MARGINAL cost of a
    chained GroupNorm (3 passes over the array per iteration: stats read,
    normalize read, write).

    The round-4 audit (benchmarks/fusion_bw_audit.py) showed the previous
    probes were artifacts: a single-op ``x*c`` dispatch chain is dominated
    by relay per-dispatch latency, and a same-constant fori_loop multiply
    chain gets collapsed (8 vs 16 reps measured 1.01x). GroupNorm chained
    through a kept while-loop cannot fold, each iteration provably makes 3
    passes, and differencing two rep counts cancels the relay floor — this
    measures ~700 GB/s (85-90%% of the 819 GB/s v5e spec) where the old
    probes read 90-290."""
    import jax.numpy as jnp
    from jax import lax

    n = mb * 1024 * 1024 // 2
    rows = n // 128
    x = jnp.linspace(-2.0, 2.0, rows * 128, dtype=jnp.float32).astype(
        jnp.bfloat16
    ).reshape(rows, 128)

    def mk(reps):
        @jax.jit
        def f(x):
            def body(_, x):
                # stats over 32-row sublane groups: the minor (lane) dim
                # stays 128 so no relayout sneaks into the loop body (a
                # rows<->lane regroup was measured to cost ~2.5x)
                g = x.reshape(rows // 32, 32, 128).astype(jnp.float32)
                mean = jnp.mean(g, axis=(1, 2), keepdims=True)
                var = (
                    jnp.mean(jnp.square(g), axis=(1, 2), keepdims=True)
                    - mean * mean
                )
                y = (g - mean) * jax.lax.rsqrt(var + 1e-5)
                return y.astype(jnp.bfloat16).reshape(rows, 128)

            return lax.fori_loop(0, reps, body, x)

        return f

    def timed(fn):
        _ = float(fn(x).reshape(-1)[0])  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(x)
            _ = float(out.reshape(-1)[0])  # value-force past the relay
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = timed(mk(4)), timed(mk(12))
    per_pass = max((t_hi - t_lo) / 8, 1e-9)
    return 3 * n * 2 / per_pass / 1e9


def _build_config(
    family, batch, res, reference_style,
    cached=False, frozen_te=False, grad_ckpt=None, ff_remat=None,
    ref_strict=False,
):
    from stable_diffusion_training_tpu.train import TrainingConfig

    reference_style = reference_style or ref_strict
    if grad_ckpt is None:
        grad_ckpt = os.environ.get("BENCH_GRAD_CKPT", "") == "1"
    if ff_remat is None:
        ff_remat = os.environ.get("BENCH_FF_REMAT", "") == "1"
    return TrainingConfig(
        # SDXL-scale legs (BASELINE configs 4/5): offline VAE latent cache +
        # precomputed frozen-tower context + micro-conditioning
        use_latent_cache=cached,
        cached_text_context=cached and frozen_te,
        sdxl_micro_conditioning=cached,
        train_text_encoder=not frozen_te,
        model_path=family,
        batch_size=batch,
        learning_rate=1e-4,
        unet_learning_rate=1e-4,
        text_encoder_learning_rate=1e-4,
        lr_scheduler="constant",
        adam_to_lion_scale_factor=7.0,
        # honor the bench cache knobs: BENCH_COMPILE_CACHE=0 must give a
        # genuinely cold leg (the AOT path re-initializes the cache from
        # this field, which previously re-enabled it behind the knob)
        compilation_cache_path=(
            os.environ.get("BENCH_COMPILE_CACHE_DIR", "/tmp/jax_cache_bench")
            if os.environ.get("BENCH_COMPILE_CACHE", "1") == "1"
            else None
        ),
        keep_compiled_fn_in_cache=True,
        text_encoder_context_window=77,
        context_window_concatenation_count=3,
        aot_compile=True,
        strip_bos_eos_token=True,
        offset_noise_magnitude=0.0,
        min_snr_gamma_magnitude=0.0,
        perturbation_noise_magnitude=0.0,
        image_area_root=[res],
        minimum_axis_length=[res],
        beta_scheduler="zero_snr_scaled_linear",
        prediction_type="v_prediction",
        excluded_layer_pattern_from_weight_decay=["bias", "scale", "embedding"],
        excluded_layer_from_quantization=["bias", "scale", "embedding"],
        quant_block_size=16,
        quantize_unet_state=True,
        quantize_text_encoder_state=True,
        accumulate_unet_ema=False,
        accumulate_text_encoder_ema=False,
        ema_rate=0.0,
        mixed_precision="bfloat16",
        model_family=family,
        # reference-style leg: exact single-chunk XLA attention (the patched
        # reference's computation) + jnp 8-bit Lion; optimized leg: Pallas
        # flash attention + fused Pallas Lion kernel
        attention_backend=(
            "xla"
            if reference_style
            else os.environ.get("BENCH_ATTN", "auto")
        ),
        use_pallas_lion=False if reference_style else None,
        # BENCH_LION_BUCKET=0 A/Bs the small-leaf bucketing at step level;
        # default 65536 = the production default (on-chip A/B 2026-08-18:
        # -9 ms/step at the headline, lion_bucket_ab.py 2.1x on small leaves)
        lion_bucket_max_nb=(
            0
            if reference_style
            else int(os.environ.get("BENCH_LION_BUCKET", "65536"))
        ),
        # BENCH_LION_COMPANDER=fast A/Bs the reassociated Lion compander at
        # step level (reference-style legs always use the exact reference
        # math — the anchor must stay bitwise vs lion_quant.py)
        lion_compander=(
            "exact"
            if reference_style
            else os.environ.get("BENCH_LION_COMPANDER", "exact")
        ),
        # STRICT-FAITHFUL anchor (ref_strict): additionally store momentum
        # in the reference's own (n_blocks, 16) narrow order
        # (/root/reference/lion_quant.py:66-92) instead of the framework's
        # dense/transposed TPU layouts, which the plain reference-style leg
        # inherits. Reported as ref_strict_* / vs_baseline_strict.
        lion_momentum_layout="reference" if ref_strict else "auto",
        # BENCH_VAE_POLY=1 A/Bs the polyphase stride-2 VAE downsample
        # (ops.conv) at step level; reference-style legs keep the fused
        # stride-2 form the reference's XLA trace produces
        vae_polyphase_downsample=(
            False
            if reference_style
            else os.environ.get("BENCH_VAE_POLY", "") == "1"
        ),
        # BENCH_GRAD_CKPT=1 remats the UNet blocks (bigger batches fit HBM);
        # BENCH_FF_REMAT=1 remats only the GEGLU feed-forwards (cheaper)
        gradient_checkpointing=grad_ckpt,
        ff_gradient_checkpointing=ff_remat,
    )


def synthetic_cached_batch(batch, res, ctx_len=227, ctx_dim=2048,
                           pooled_dim=1280, time_ids_count=6):
    """SDXL-recipe batch: offline VAE latent moments + precomputed
    frozen-dual-tower context + pooled embeds + size/crop time_ids (the
    shapes ``data.latent_cache`` produces for BASELINE configs 4/5)."""
    rng = np.random.default_rng(0)
    lat = res // 8
    return {
        "latent_moments": rng.normal(
            size=(batch, 8, lat, lat)
        ).astype(np.float32),
        "encoder_hidden_states": rng.normal(
            size=(batch, ctx_len, ctx_dim)
        ).astype(np.float32),
        "pooled_text_embeds": rng.normal(
            size=(batch, pooled_dim)
        ).astype(np.float32),
        "time_ids": np.tile(
            np.asarray([res, res, 0, 0, res, res][:time_ids_count],
                       np.float32),
            (batch, 1),
        ),
    }


def _compiler_options_from_env():
    """BENCH_COMPILER_OPTIONS: JSON dict of XLA debug options, threaded into
    PJRT CompileOptions env overrides so they reach the RELAY-side compiler
    (client XLA_FLAGS never do on the tunneled axon platform). e.g.
    ``'{"xla_tpu_scoped_vmem_limit_kib": "32768"}'``. Swept 2026-08-19 on the
    headline leg (PERF_NOTES round 5): scoped-vmem 32M within noise, 64M/96M
    and the latency-hiding scheduler regress — no default is set."""
    raw = os.environ.get("BENCH_COMPILER_OPTIONS", "")
    if not raw:
        return None
    opts = json.loads(raw)
    if not isinstance(opts, dict):
        raise ValueError(
            f"BENCH_COMPILER_OPTIONS must be a JSON object, got {type(opts).__name__}"
        )
    return {str(k): str(v) for k, v in opts.items()}


def run_leg(
    family, batch, res, steps, reference_style,
    cached=False, frozen_te=False, grad_ckpt=None, ff_remat=None,
    ref_strict=False,
):
    """Measure one variant of the fused train step. Returns a metrics dict.

    ``cached``/``frozen_te``/``grad_ckpt`` select the SDXL-scale recipe
    (BASELINE configs 4/5): latent-moments batches with precomputed context
    instead of pixels+ids, frozen text encoder, block remat. ``ff_remat``
    remats only the GEGLU feed-forwards (the cheap variant that won the
    config-3 768² ladder — PERF_NOTES)."""
    from jax.sharding import NamedSharding, PartitionSpec

    from stable_diffusion_training_tpu.core import mesh as mesh_lib
    from stable_diffusion_training_tpu.data.memory import synthetic_batch
    from stable_diffusion_training_tpu.train import (
        on_device_model_training_state,
        train_step,
    )

    cfg = _build_config(
        family, batch, res, reference_style,
        cached=cached, frozen_te=frozen_te, grad_ckpt=grad_ckpt,
        ff_remat=ff_remat, ref_strict=ref_strict,
    )
    (unet_state, te_state, _, _, frozen_vae, frozen_sched, _) = (
        on_device_model_training_state(cfg)
    )

    from stable_diffusion_training_tpu.models import configs as model_configs

    fam = model_configs.MODEL_FAMILIES[family]
    if cached:
        te2 = fam.get("text_encoder_2", {})
        b = synthetic_cached_batch(
            batch, res,
            ctx_dim=fam["unet"]["cross_attention_dim"],
            pooled_dim=te2.get("projection_dim", 1280),
        )
    else:
        vocab = fam["text_encoder"]["vocab_size"]
        b = synthetic_batch(
            batch, (res, res), concat_count=3, seed=0, vocab_size=vocab
        )
    mesh = mesh_lib.get_default_mesh()
    b = jax.tree_util.tree_map(
        lambda leaf: jax.device_put(
            leaf, NamedSharding(mesh, PartitionSpec("data_parallel"))
        ),
        b,
    )

    step = jax.jit(
        train_step,
        # donate all four state slots (EMA included) as training does
        donate_argnums=(0, 1, 2, 3),
        static_argnames=(
            "strip_bos_eos_token",
            "offset_noise_magnitude",
            "min_snr_gamma_magnitude",
            "perturbation_noise_magnitude",
            "ema_rate",
            "train_text_encoder",
            "vae_encode_chunk",
        ),
    )
    static_kwargs = dict(
        strip_bos_eos_token=True,
        offset_noise_magnitude=0.0,
        min_snr_gamma_magnitude=0.0,
        perturbation_noise_magnitude=0.0,
        ema_rate=0.0,
        train_text_encoder=not frozen_te,
        # per-sample VAE encode at >=768²: flips XLA off the f32
        # spatially-partitioned conv strategy (2.2x faster encode,
        # bitwise-identical moments — PERF_NOTES round 3)
        vae_encode_chunk=1 if (res >= 768 and not cached) else 0,
    )

    compiler_options = _compiler_options_from_env()

    # compile ONCE via lower().compile() and reuse the same executable for
    # both cost analysis and the timed runs (calling the jit wrapper after
    # a .lower() would trace+compile the identical program a second time)
    compiled = None
    flops_per_step = None
    try:
        lowered = step.lower(
            unet_state, te_state, None, None, b, jax.random.PRNGKey(0),
            frozen_vae, frozen_sched, **static_kwargs,
        )
        compiled = lowered.compile(compiler_options=compiler_options)
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops_per_step = float(cost.get("flops", 0.0)) or None
        if static_kwargs.get("vae_encode_chunk") and flops_per_step:
            # XLA's cost analysis counts a lax.map body ONCE, so the
            # chunked-VAE program under-reports true model FLOPs; take
            # them from the whole-batch variant of the same leg instead
            # (an extra compile, but only BENCH_CONFIGS legs chunk)
            try:
                ref_cost = step.lower(
                    unet_state, te_state, None, None, b,
                    jax.random.PRNGKey(0), frozen_vae, frozen_sched,
                    **{**static_kwargs, "vae_encode_chunk": 0},
                ).compile().cost_analysis()
                if isinstance(ref_cost, (list, tuple)):
                    ref_cost = ref_cost[0]
                flops_per_step = (
                    float(ref_cost.get("flops", 0.0)) or flops_per_step
                )
            except Exception:
                pass  # keep the (understated) chunked-program count
    except Exception:
        compiled = None

    if compiled is not None:
        def run_one(unet_state, te_state, rng):
            return compiled(
                unet_state, te_state, None, None, b, rng,
                frozen_vae, frozen_sched,
            )
    else:
        def run_one(unet_state, te_state, rng):
            return step(
                unet_state, te_state, None, None, b, rng,
                frozen_vae, frozen_sched, **static_kwargs,
            )

    rng = jax.random.PRNGKey(0)
    # warmup / compile; float() forces a full device->host sync (plain
    # block_until_ready returns early through the remote-TPU relay)
    for _ in range(2):
        out = run_one(unet_state, te_state, rng)
        unet_state, te_state, rng = out[0], out[1], out[5]
        _ = float(out[4]["loss"])

    # steady-state: time GROUPS of chained steps (async dispatch preserved,
    # as in real training) and take a true median over group means
    group = max(2, steps // 5)
    n_groups = max(5, steps // group)
    samples = []
    for _ in range(n_groups):
        t0 = time.perf_counter()
        for _ in range(group):
            out = run_one(unet_state, te_state, rng)
            unet_state, te_state, rng = out[0], out[1], out[5]
        final_loss = float(out[4]["loss"])  # full sync
        samples.append((time.perf_counter() - t0) / group)

    p50 = float(np.median(samples))

    if os.environ.get("BENCH_TRACE"):
        # trace 3 steady-state steps of THIS leg and print the per-category
        # serialized-time table (utils.xplane) to stderr — works for every
        # leg run_leg can build, including cached-latent SDXL recipes
        import glob
        import sys as _sys
        import tempfile

        from stable_diffusion_training_tpu.utils import xplane

        trace_dir = tempfile.mkdtemp(prefix="sdt_bench_trace_")
        with jax.profiler.trace(trace_dir):
            for _ in range(3):
                out = run_one(unet_state, te_state, rng)
                unet_state, te_state, rng = out[0], out[1], out[5]
            _ = float(out[4]["loss"])
        paths = glob.glob(
            os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
        )
        if paths:
            print(f"# trace of {family} b{batch} @{res}:\n"
                  + xplane.category_report(paths[0], 3, wall_ms=p50 * 1e3),
                  file=_sys.stderr, flush=True)

    n_chips = jax.device_count()
    peak = _chip_peak_flops()
    mfu = None
    if flops_per_step and peak:
        mfu = round(flops_per_step / (p50 * peak * n_chips), 4)
    return {
        "p50_step_time_s": round(p50, 5),
        "mean_step_time_s": round(float(np.mean(samples)), 5),
        "images_per_sec_per_chip": round(batch / p50 / n_chips, 4),
        "mfu": mfu,
        "flops_per_step": flops_per_step,
        "n_chips": n_chips,
        "chip_peak_flops": peak or None,
        "loss": final_loss,
    }


# BASELINE.md benchmark configurations 3-5 (config 2 is the headline leg;
# config 1 is a CPU correctness config, not a throughput target). Batch
# candidates are tried largest-first until one fits HBM.
EXTRA_LEGS = {
    "3": dict(  # SD 2.1 @ 768² + 8-bit quantized Lion
        # ladder head is the remat-ladder winner (PERF_NOTES round 4):
        # GEGLU-only remat unlocks b8 past the b6 HBM wall (+7.3%); b12
        # OOMs HBM even with it and b10's compile crashes the remote
        # helper (3/3 attempts), so b8 closed the ladder
        family="sd21", res=768,
        batches=((8, dict(ff_remat=True)), 6, 4, 2),
    ),
    "4": dict(  # SDXL-scale UNet + gradient checkpointing
        # b8 is off the ladder: its compile exceeds the relay helper's
        # resource cap (JaxRuntimeError, observed 2026-08-17 and again
        # 2026-08-19 — the latter crash poisoned every later in-process
        # attempt, which is what motivated the child-process isolation),
        # and a failed compile can never be served by the cache, so the
        # attempt re-costs ~10 min every run. Largest feasible is b4
        # (3.01 img/s, MFU 41.6% — the recommended SDXL recipe).
        family="sdxl", res=1024, batches=(4, 2, 1),
        cached=True, frozen_te=True, grad_ckpt=True,
    ),
    "5": dict(  # SDXL 1024² + offline latent cache + frozen text encoders
        family="sdxl", res=1024, batches=(4, 2, 1),
        cached=True, frozen_te=True,
    ),
}


def _init_compile_cache():
    """Enable the persistent jax compilation cache (BENCH_COMPILE_CACHE=0
    disables). Serialized executables keyed by program+jaxlib+backend let a
    later bench invocation — or a child leg process — skip the slow remote
    compiles (measured 6m36s vs 13m54s for an identical SDXL leg)."""
    if os.environ.get("BENCH_COMPILE_CACHE", "1") != "1":
        return
    try:
        from stable_diffusion_training_tpu.train.aot import (
            initialize_compilation_cache,
        )
        initialize_compilation_cache(
            os.environ.get("BENCH_COMPILE_CACHE_DIR", "/tmp/jax_cache_bench")
        )
    except Exception as exc:  # cache is an optimization, never fatal
        print(f"# compile cache unavailable: {type(exc).__name__}",
              flush=True)


def _run_leg_raw(spec):
    """Execute one leg spec in THIS process (child body / in-proc fallback).

    ``kind: "probes"`` runs the measured-achievable device probes; anything
    else is a ``run_leg`` kwargs dict."""
    spec = dict(spec)
    kind = spec.pop("kind", "leg")
    if kind == "noop":
        # harness self-test: exercises the child protocol (TPU claim,
        # LEG_RESULT round-trip) without compiling anything
        return {"noop": True}
    if kind == "probes":
        return {
            "measured_peak_tflops": round(_measured_peak_flops() / 1e12, 2),
            "measured_hbm_gbps": round(_measured_hbm_bandwidth(), 1),
            "measured_conv_tflops": round(_measured_conv_tflops(), 1),
        }
    return run_leg(**spec)


def _one_leg_main(spec_json):
    """Child-process entry (``bench.py --one-leg '<json>'``): claim the TPU,
    run ONE leg, print the result as a ``LEG_RESULT`` line. Crash isolation
    is the point: the 2026-08-19 full-bench capture showed one oversized
    SDXL compile killing the relay's tpu_compile_helper and poisoning every
    later in-process attempt (all batches JaxRuntimeError) while a fresh
    process ran the same leg fine — so each attempt now gets its own
    process, sharing compiles via the persistent cache."""
    import jax.numpy as jnp

    spec = json.loads(spec_json)
    _init_compile_cache()
    # force a real device claim before reporting init (jax.devices() alone
    # succeeds even when the tunneled chip's pool claim would hang)
    float(jnp.zeros((8,), jnp.float32).sum())
    print("LEG_TPU_INIT_OK", flush=True)
    result = _run_leg_raw(spec)
    print("LEG_RESULT " + json.dumps(result), flush=True)


def _leg_in_child(spec, timeout_s):
    """Run one leg spec in a child process. Returns (result|None, err|None,
    init_ok) — init_ok False means the child never claimed the TPU, which
    callers treat as "try in-process" rather than a genuine leg failure."""
    import subprocess
    import sys

    cmd = [sys.executable, "-u", os.path.abspath(__file__),
           "--one-leg", json.dumps(spec)]
    try:
        # stdout captured for parsing; stderr inherited so compile noise and
        # child tracebacks stay visible in the bench log
        proc = subprocess.run(
            cmd, stdout=subprocess.PIPE, text=True, timeout=timeout_s,
        )
        out, rc = proc.stdout or "", proc.returncode
    except subprocess.TimeoutExpired as exc:
        out = exc.stdout or ""
        if isinstance(out, bytes):
            out = out.decode(errors="replace")
        return None, f"timeout after {timeout_s:.0f}s", (
            "LEG_TPU_INIT_OK" in out
        )
    result, init_ok = None, False
    for line in out.splitlines():
        if line == "LEG_TPU_INIT_OK":
            init_ok = True
        elif line.startswith("LEG_RESULT "):
            result = json.loads(line[len("LEG_RESULT "):])
        elif line.strip():
            print(f"# [leg] {line}", file=sys.stderr, flush=True)
    if result is not None:
        return result, None, init_ok
    return None, f"child exit {rc}", init_ok


# Once ANY leg has run in this process, every later leg must too: the
# tunneled platform serializes chip claims across processes (measured
# 2026-08-19 — a child's first allocation blocks indefinitely while the
# parent holds a live client), so mixing in-process and child legs would
# wedge every subsequent child until its timeout.
_FORCE_INPROC = False


def _attempt_leg(spec, timeout_s, label):
    """One leg attempt: child process first (crash/HBM isolation), falling
    back to in-process only when the child died before claiming the TPU
    (init flake / platform refusing a second client). Raises on failure so
    callers' batch-fallback ladders work unchanged. BENCH_SUBPROC=0 forces
    the old everything-in-process mode."""
    global _FORCE_INPROC
    if _FORCE_INPROC or os.environ.get("BENCH_SUBPROC", "1") != "1":
        return _run_leg_raw(spec)
    result, err, init_ok = _leg_in_child(spec, timeout_s)
    if result is not None:
        return result
    if not init_ok and "timeout" not in (err or ""):
        print(f"# {label}: child failed before TPU init ({err}); "
              "switching to in-process legs", flush=True)
        _FORCE_INPROC = True
        return _run_leg_raw(spec)
    raise RuntimeError(f"{label}: {err}")


def run_extra_leg(name, steps, deadline=None):
    """Run one BASELINE config leg down its batch ladder. ``deadline`` is an
    absolute ``time.monotonic()`` cutoff: each attempt's child gets
    ``min(BENCH_ATTEMPT_TIMEOUT_S, max(BENCH_MIN_LEG_S, deadline - now))``
    so a wedged compile can't eat the rest of the budget."""
    spec = dict(EXTRA_LEGS[name])
    batches = spec.pop("batches")
    family, res = spec.pop("family"), spec.pop("res")
    attempt_cap = float(os.environ.get("BENCH_ATTEMPT_TIMEOUT_S", "1800"))
    min_leg_s = float(os.environ.get("BENCH_MIN_LEG_S", "420"))
    for i, b in enumerate(batches):
        # a ladder entry is either a batch size or (batch, overrides) —
        # e.g. config-3's winning variant is FF-remat at b8, with plain
        # no-remat b6 as the fallback when the remat compile fails
        overrides = {}
        if isinstance(b, (tuple, list)):
            b, overrides = b
        timeout_s = attempt_cap
        if deadline is not None:
            remaining = deadline - time.monotonic()
            if i > 0 and remaining < min_leg_s:
                # budget expired mid-ladder: stop rather than re-arming the
                # min_leg_s floor for every remaining batch (the caller
                # admitted this leg while budget remained, so the FIRST
                # attempt always runs; later ones must still fit)
                print(f"# config-{name}: budget expired mid-ladder before "
                      f"batch {b}", flush=True)
                break
            timeout_s = min(attempt_cap, max(min_leg_s, remaining))
        try:
            leg_spec = dict(
                family=family, batch=b, res=res, steps=steps,
                reference_style=False, **{**spec, **overrides},
            )
            r = _attempt_leg(leg_spec, timeout_s, f"config-{name} b{b}")
            return {
                "metric": f"train_images_per_sec_per_chip_{family}_{res}"
                + ("_cached" if spec.get("cached") else ""),
                "value": r["images_per_sec_per_chip"],
                "unit": "images/sec/chip",
                "baseline_config": name,
                "batch_size": b,
                **{k: v for k, v in r.items()
                   if k != "images_per_sec_per_chip"},
                **{k: v for k, v in spec.items() if v},
                **{k: v for k, v in overrides.items() if v},
            }
        except Exception as exc:
            msg = str(exc).replace("\n", " ")[:200]
            print(
                f"# config-{name} leg failed at batch {b}: "
                f"{type(exc).__name__}: {msg}",
                flush=True,
            )
    return {"metric": f"baseline_config_{name}", "value": None,
            "unit": "images/sec/chip", "baseline_config": name,
            "error": "no batch size fit"}


def _tpu_available(timeout_s: int = 240) -> bool:
    """Probe backend init in a SUBPROCESS with a hard timeout: the tunneled
    TPU's pool claim can hang for hours in a NATIVE call when the chip is
    co-tenanted away (observed 2026-08-18) — a signal.alarm can't interrupt
    that, but killing a child process can. Backend init can also raise
    Unavailable; both cases return False so the caller can emit a
    parseable fallback record instead of wedging."""
    import subprocess
    import sys

    try:
        # probe with a REAL allocation, not just jax.devices(): the device
        # listing succeeds even while the chip's pool claim is held by a
        # co-tenant (observed 2026-08-19, >25 min block) — only the first
        # buffer allocation exposes a claim-blocked chip, and catching it
        # here yields a clean fallback record instead of hours of leg
        # timeouts
        proc = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp; "
             "print('up' if float(jnp.zeros((8,), jnp.float32).sum()) == 0.0"
             " else 'bad')"],
            capture_output=True, timeout=timeout_s, text=True,
        )
        return proc.returncode == 0 and "up" in proc.stdout
    except Exception:
        return False


def _tpu_available_with_retry() -> bool:
    """Bounded retry/backoff around the TPU probe: the rig's outages are
    often transient pool-claim contention, so one failed probe should not
    condemn the whole capture window to a recorded-values artifact.
    BENCH_TPU_RETRIES probes (default 5), BENCH_TPU_BACKOFF_S between them
    (default 120) — worst case ~28 min before giving up (sized to outlast
    the 25-min co-tenant claim block observed 2026-08-19)."""
    retries = int(os.environ.get("BENCH_TPU_RETRIES", "5"))
    backoff = float(os.environ.get("BENCH_TPU_BACKOFF_S", "120"))
    for attempt in range(max(1, retries)):
        if _tpu_available():
            return True
        if attempt + 1 < retries:
            print(
                f"# TPU probe {attempt + 1}/{retries} failed; retrying in "
                f"{backoff:.0f}s",
                flush=True,
            )
            time.sleep(backoff)
    return False


def main():
    batch = int(os.environ.get("BENCH_BATCH", "16"))
    res = int(os.environ.get("BENCH_RES", "512"))
    steps = int(os.environ.get("BENCH_STEPS", "10"))
    family = os.environ.get("BENCH_FAMILY", "sd15")
    skip_ref = os.environ.get("BENCH_SKIP_REF", "") == "1"

    if not _tpu_available_with_retry():
        # chip unavailable: emit a record whose VALUE IS NULL so no
        # value-keyed consumer can mistake stale numbers for a live
        # measurement; the last measured numbers ride along only under
        # the clearly-separate recorded_* fields (provenance:
        # PERF_NOTES.md, session date)
        print(json.dumps({
            "metric": f"train_images_per_sec_per_chip_{family}_{res}",
            "value": None, "unit": "images/sec/chip",
            "vs_baseline": None,
            "error": "tpu_unavailable_at_bench_time",
            "recorded_not_fresh": True,
            "recorded_on": "2026-08-19",
            "recorded_headline": {
                "images_per_sec_per_chip": 23.72, "vs_baseline": 2.0307,
                "baseline_anchor": "same_session_reference_style_step_batch8",
                "vs_baseline_strict": 2.5563,
                "batch_size": 16, "mfu": 0.4029, "mfu_vs_measured": 0.7298,
            },
            "recorded_config_legs": RECORDED_CONFIG_LEGS,
        }))
        return

    # the config-leg time budget runs from the moment the chip became
    # claimable, not process start: a long (but won) probe wait must not
    # eat the budget and silently downgrade every leg to recorded values
    budget_start = time.monotonic()

    # persistent compile cache across bench invocations: first compiles
    # through the remote tunnel ate the config-leg time budget in earlier
    # sessions (PERF_NOTES round-5 anchor capture), so serialized
    # executables from a prior run let a later one (e.g. the driver's)
    # spend its budget on measurement instead. jax keys entries by
    # program+jaxlib+backend, so staleness is self-invalidating. Child leg
    # processes initialize it themselves; this covers in-process fallback.
    _init_compile_cache()

    headline_timeout = float(
        os.environ.get("BENCH_HEADLINE_TIMEOUT_S", "2400")
    )
    anchor_timeout = float(os.environ.get("BENCH_ATTEMPT_TIMEOUT_S", "1800"))

    # headline leg with a bounded batch-fallback ladder: co-tenant HBM
    # pressure can push the preferred operating point out of memory at
    # capture time; a smaller live measurement beats no artifact. Only
    # SMALLER batches are tried (falling back upward would both contradict
    # the rationale and silently change the requested operating point).
    opt = None
    ladder = [batch] + [b for b in (12, 8, 4) if b < batch][:2]
    for batch in ladder:
        try:
            opt = _attempt_leg(
                dict(family=family, batch=batch, res=res, steps=steps,
                     reference_style=False),
                headline_timeout, f"headline b{batch}",
            )
            break
        except Exception as exc:
            print(
                f"# headline leg failed at batch {batch}: "
                f"{type(exc).__name__}: {exc}",
                flush=True,
            )
    if opt is None:
        print(json.dumps({
            "metric": f"train_images_per_sec_per_chip_{family}_{res}",
            "value": None, "unit": "images/sec/chip",
            "vs_baseline": None,
            "error": "headline_leg_failed_all_batches",
        }))
        return

    ref = None
    ref_batch = batch
    if not skip_ref:
        # the reference-style step is more memory-hungry (materialized f32
        # attention logits): measured on 16G v5e it OOMs at batch 12 where
        # the flash-based step runs, so for batch > 8 start it at 8 — its
        # own largest feasible operating point. images/sec/chip is
        # per-image, so the same-session comparison stays honest (each
        # variant at its best operating point on identical hardware).
        candidates = (batch, 4) if batch <= 8 else (8, 4)
        for ref_batch in dict.fromkeys(candidates):
            try:
                ref = _attempt_leg(
                    dict(family=family, batch=ref_batch, res=res,
                         steps=max(4, steps // 2), reference_style=True),
                    anchor_timeout, f"reference-style b{ref_batch}",
                )
                break
            except Exception as exc:
                print(
                    f"# reference-style leg failed at batch {ref_batch}: "
                    f"{type(exc).__name__}: "
                    f"{str(exc)[:200]}",
                    flush=True,
                )

    # STRICT-FAITHFUL anchor (VERDICT round-4 item 4): the plain
    # reference-style leg above inherits the framework's dense momentum
    # layout; this one also stores momentum in the reference's own narrow
    # (n_blocks, 16) order — the closest reproduction of the reference's
    # actual computation this rig can run. Both ratios are reported.
    strict = None
    strict_batch = ref_batch
    # only attempt the strict anchor when the plain reference-style leg
    # succeeded: strict is the same step plus the slower narrow momentum
    # layout, so after a ref failure it would almost surely fail too while
    # burning up to 2x the attempt timeout out of the config-leg budget
    if ref and os.environ.get("BENCH_SKIP_STRICT", "") != "1":
        for strict_batch in dict.fromkeys((ref_batch, 4)):
            try:
                strict = _attempt_leg(
                    dict(family=family, batch=strict_batch, res=res,
                         steps=max(4, steps // 2), reference_style=True,
                         ref_strict=True),
                    anchor_timeout, f"ref-strict b{strict_batch}",
                )
                break
            except Exception as exc:
                print(
                    f"# ref-strict leg failed at batch {strict_batch}: "
                    f"{type(exc).__name__}: {str(exc)[:200]}",
                    flush=True,
                )

    if ref:
        vs_baseline = opt["images_per_sec_per_chip"] / ref[
            "images_per_sec_per_chip"
        ]
        anchor = (
            "same_session_reference_style_step"
            if ref_batch == batch
            else f"same_session_reference_style_step_batch{ref_batch}"
        )
    else:
        vs_baseline = (
            opt["images_per_sec_per_chip"] / RECORDED_BASELINE
            if RECORDED_BASELINE
            else 1.0
        )
        anchor = "recorded_round1_value"

    record = {
        "metric": f"train_images_per_sec_per_chip_{family}_{res}",
        "value": opt["images_per_sec_per_chip"],
        "unit": "images/sec/chip",
        "vs_baseline": round(vs_baseline, 4),
        "baseline_anchor": anchor,
        "batch_size": batch,
        **{k: v for k, v in opt.items() if k != "images_per_sec_per_chip"},
    }
    if os.environ.get("BENCH_SKIP_PEAK", "") != "1":
        try:
            probes = _attempt_leg({"kind": "probes"}, 900, "device probes")
            record.update(probes)
            measured = (probes.get("measured_peak_tflops") or 0) * 1e12
            if opt.get("flops_per_step") and measured:
                record["mfu_vs_measured"] = round(
                    opt["flops_per_step"]
                    / (opt["p50_step_time_s"] * measured * opt["n_chips"]),
                    4,
                )
        except Exception as exc:
            print(f"# device probes failed: {type(exc).__name__}: "
                  f"{str(exc)[:200]}", flush=True)
    if ref:
        record["ref_style_images_per_sec_per_chip"] = ref[
            "images_per_sec_per_chip"
        ]
        record["ref_style_p50_step_time_s"] = ref["p50_step_time_s"]
        record["ref_style_mfu"] = ref["mfu"]
        record["ref_style_batch_size"] = ref_batch
    if strict:
        record["vs_baseline_strict"] = round(
            opt["images_per_sec_per_chip"]
            / strict["images_per_sec_per_chip"],
            4,
        )
        record["ref_strict_images_per_sec_per_chip"] = strict[
            "images_per_sec_per_chip"
        ]
        record["ref_strict_p50_step_time_s"] = strict["p50_step_time_s"]
        record["ref_strict_mfu"] = strict["mfu"]
        record["ref_strict_batch_size"] = strict_batch

    # BASELINE configs 3-5: run LIVE within the remaining time budget
    # (BENCH_TIME_BUDGET_S from chip-claimable time, default 2700s); embed the
    # fresh numbers in the headline record; a leg that doesn't fit the
    # budget (or fails) falls back to its RECORDED_CONFIG_LEGS entry,
    # marked "fresh": false. BENCH_CONFIGS (comma list or "all") keeps the
    # explicit mode: those legs print their own JSON lines after the
    # headline and the embedded table is skipped.
    extra = os.environ.get("BENCH_CONFIGS", "")
    if not extra and os.environ.get("BENCH_SKIP_CONFIG_LEGS", "") != "1":
        # print the headline record IMMEDIATELY (with the recorded legs as
        # provisional fallback), so a driver timeout mid-legs still leaves
        # a complete artifact; the FINAL record with live legs prints after
        # and supersedes it for last-line consumers
        print(json.dumps({
            **record,
            "provisional": True,
            "config_legs": {
                k: {**v, "fresh": False} for k, v in
                RECORDED_CONFIG_LEGS.items()
            },
            "config_legs_note": "provisional; final record follows",
        }), flush=True)
        budget = float(os.environ.get("BENCH_TIME_BUDGET_S", "2700"))
        # ~ the longest observed leg (SDXL compile + timed steps) plus slack
        min_leg_s = float(os.environ.get("BENCH_MIN_LEG_S", "420"))
        legs = {}
        for name in EXTRA_LEGS:
            recorded_key = next(
                (k for k in RECORDED_CONFIG_LEGS if k.startswith(name)), None
            )
            remaining = budget - (time.monotonic() - budget_start)
            if remaining < min_leg_s:
                if recorded_key:
                    legs[recorded_key] = {
                        **RECORDED_CONFIG_LEGS[recorded_key],
                        "fresh": False,
                        "skip_reason": "time_budget",
                    }
                continue
            try:
                r = run_extra_leg(
                    name, max(4, steps // 2), deadline=budget_start + budget
                )
            except Exception as exc:
                print(f"# config-{name} leg crashed: {type(exc).__name__}: "
                      f"{str(exc)[:200]}", flush=True)
                r = {"value": None}
            # keep the key stable across fresh and fallback records (the
            # recorded key encodes the recipe, e.g. config-4's "gradckpt",
            # which the metric name does not) so cross-run consumers track
            # one leg under one name
            key = recorded_key or r.get("metric", f"config_{name}").replace(
                "train_images_per_sec_per_chip_", f"{name}_"
            )
            if r.get("value") is not None:
                legs[key] = {
                    "images_per_sec_per_chip": r["value"],
                    "batch_size": r.get("batch_size"),
                    "mfu": r.get("mfu"),
                    "p50_step_time_s": r.get("p50_step_time_s"),
                    "fresh": True,
                }
                if r.get("ff_remat"):
                    legs[key]["ff_remat"] = True
            elif recorded_key:
                legs[recorded_key] = {
                    **RECORDED_CONFIG_LEGS[recorded_key],
                    "fresh": False,
                    "skip_reason": "leg_failed",
                }
        record["config_legs"] = legs
    print(json.dumps(record))

    # BENCH_CONFIGS="3,4,5" (or "all") appends one JSON line per extra
    # BASELINE config AFTER the final headline record. NOTE on line order
    # in the default mode: a PROVISIONAL headline record (marked
    # "provisional": true, recorded legs only) prints before the config
    # legs run, so a driver killed mid-legs still gets a complete artifact;
    # the FINAL record (live legs, no "provisional" key) is always the
    # LAST headline-metric line — last-line consumers get fresh data.
    if extra:
        names = (
            list(EXTRA_LEGS) if extra == "all" else
            [n.strip() for n in extra.split(",") if n.strip() in EXTRA_LEGS]
        )
        for name in names:
            print(json.dumps(run_extra_leg(name, max(4, steps // 2))))


if __name__ == "__main__":
    import sys

    if len(sys.argv) >= 3 and sys.argv[1] == "--one-leg":
        _one_leg_main(sys.argv[2])
    else:
        main()
