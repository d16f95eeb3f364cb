"""TPU-native Stable Diffusion training framework.

A from-scratch JAX/XLA/Pallas/pjit re-implementation of the capabilities of
``lodestone-rock/stable_diffusion_training`` (see SURVEY.md): aspect-ratio-bucketed
Stable Diffusion finetuning with per-resolution AOT-compiled fused train steps,
DDPM/DDIM schedulers with zero-terminal-SNR rescale and v-prediction, an 8-bit
block-quantized Lion optimizer (Pallas-fused on TPU), EMA, min-SNR/offset/perturbation
noise options, a streamer-style chunked data pipeline, chunk-granular JSON-state
resume, diffusers-format checkpointing, and a CFG text-to-image inference pipeline.

Layering (bottom-up): ``utils`` -> ``core``/``parallel`` -> ``ops`` (Pallas kernels)
-> ``diffusion``/``optim``/``models`` -> ``data`` -> ``train`` -> ``pipeline``.
"""

__version__ = "0.1.0"
