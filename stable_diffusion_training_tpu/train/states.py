"""Model/state assembly: load models, build Lion TrainStates, place on mesh.

Behavior parity with ``/root/reference/training_utils.py:40-50, 177-501``
(``FrozenModel``, ``load_models``, ``create_frozen_states``,
``create_lion_optimizer_states``, ``on_device_model_training_state``) —
including the reference's quirks, reproduced deliberately:

- ``on_device_model_training_state`` hardcodes ``adam_to_lion_scale_factor=7``
  and does NOT forward the configured learning rates (they fall to the 1e-6
  defaults) — ``training_utils.py:432-442`` vs ``:287-288``;
- EMA buffers start as copies of the *initial* params (``:466-483``);
- optimizer construction runs on CPU to keep HBM free (``:353``).

TPU-native differences: models are this framework's NHWC implementations (no
HF dependency), placement supports FSDP param sharding on an ``fsdp`` mesh
axis in addition to the reference's fully-replicated layout.
"""

import os
from typing import Any, Callable, Optional

import flax
import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.training import train_state
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from ..core import mesh as mesh_lib
from ..diffusion import DDPMScheduler
from ..models import AutoencoderKL, CLIPTextModel, UNet2DConditionModel, configs
from ..models import hf_io
from ..optim import create_mask, lion_8bit
from ..parallel.sharding import params_fsdp_sharding
from .config import TrainingConfig


class FrozenModel(struct.PyTreeNode):
    """Bundle a non-pytree model/scheduler object with its pytree params so
    frozen modules pass through jit (reference ``training_utils.py:40-49``)."""

    call: Callable = struct.field(pytree_node=False)
    params: Any = struct.field(pytree_node=True)


def _dtype_from_name(name: str):
    return {
        "bfloat16": jnp.bfloat16,
        "bf16": jnp.bfloat16,
        "float32": jnp.float32,
        "fp32": jnp.float32,
        "no": jnp.float32,
    }[name]


def _is_checkpoint_dir(path: str) -> bool:
    return os.path.isdir(os.path.join(path, "unet"))


def load_models(training_config: TrainingConfig) -> dict:
    """Load (or freshly build) UNet/VAE/text-encoder + the training scheduler.

    Returns the reference's nested dict shape
    (``/root/reference/training_utils.py:233-250``). ``model_path`` may be:
    - a diffusers-format checkpoint directory (unet/vae/text_encoder
      subfolders) — weights converted from safetensors;
    - a model family name (``sd15``/``sd21``/``sdxl``/``tiny``) — random
      init seeded by ``seed_init`` (tests, benchmarks).
    """
    from ..models.attention import set_remat_ff

    set_remat_ff(training_config.ff_gradient_checkpointing)
    dtype = _dtype_from_name(training_config.mixed_precision)
    model_dir = training_config.model_path
    common = dict(
        dtype=dtype,
        param_dtype=dtype,
        data_format="NHWC",
    )

    if _is_checkpoint_dir(model_dir):
        unet_cfg = hf_io.load_config_json(os.path.join(model_dir, "unet"))
        vae_cfg = hf_io.load_config_json(os.path.join(model_dir, "vae"))
        te_cfg = hf_io.load_config_json(os.path.join(model_dir, "text_encoder"))
        if "text_config" in te_cfg:  # transformers CLIPConfig wrapper
            te_cfg = te_cfg["text_config"]
        unet = UNet2DConditionModel.from_config(
            unet_cfg,
            gradient_checkpointing=training_config.gradient_checkpointing,
            attention_backend=training_config.attention_backend,
            **common,
        )
        vae = AutoencoderKL.from_config(
            vae_cfg,
            attention_backend=training_config.attention_backend,
            polyphase_downsample=training_config.vae_polyphase_downsample,
            **common,
        )
        text_encoder = CLIPTextModel.from_config(
            te_cfg, dtype=dtype, param_dtype=dtype
        )
        unet_params = hf_io.load_unet_params(os.path.join(model_dir, "unet"), dtype)
        vae_params = hf_io.load_vae_params(os.path.join(model_dir, "vae"), dtype)
        text_encoder_params = hf_io.load_text_encoder_params(
            os.path.join(model_dir, "text_encoder"), dtype
        )
        tokenizer = _try_load_tokenizer(model_dir)
    else:
        family = configs.MODEL_FAMILIES[
            model_dir if model_dir in configs.MODEL_FAMILIES
            else training_config.model_family
        ]
        rng = jax.random.PRNGKey(training_config.seed_init)
        unet = UNet2DConditionModel(
            **family["unet"],
            gradient_checkpointing=training_config.gradient_checkpointing,
            attention_backend=training_config.attention_backend,
            **common,
        )
        vae = AutoencoderKL(
            **family["vae"],
            attention_backend=training_config.attention_backend,
            polyphase_downsample=training_config.vae_polyphase_downsample,
            **common,
        )
        text_encoder = CLIPTextModel(**family["text_encoder"], dtype=dtype, param_dtype=dtype)
        # init on the default device (NOT the CPU context): init traces the
        # forward pass, and the Pallas attention kernel must run where the
        # training will (compiled on TPU / interpret on CPU)
        unet_params = unet.init(rng)
        vae_params = vae.init(rng)
        text_encoder_params = text_encoder.init(rng)
        tokenizer = None

    noise_scheduler = DDPMScheduler(
        beta_start=0.00085,
        beta_end=0.012,
        beta_schedule=training_config.beta_scheduler,
        num_train_timesteps=1000,
        prediction_type=training_config.prediction_type,
    )
    noise_scheduler_state = noise_scheduler.create_state()

    return {
        "unet": {"unet_params": unet_params, "unet_model": unet},
        "vae": {"vae_params": vae_params, "vae_model": vae},
        "text_encoder": {
            "text_encoder_params": text_encoder_params,
            "text_encoder_model": text_encoder,
        },
        "schedulers": {
            "noise_scheduler_state": noise_scheduler_state,
            "noise_scheduler_object": noise_scheduler,
        },
        "tokenizer": tokenizer,
    }


def _try_load_tokenizer(model_dir: str):
    tok_dir = os.path.join(model_dir, "tokenizer")
    if not os.path.isdir(tok_dir):
        return None
    try:
        from transformers import CLIPTokenizer

        return CLIPTokenizer.from_pretrained(tok_dir)
    except Exception:
        return None


def create_frozen_states(models: dict) -> dict:
    """Bundle VAE + noise scheduler as FrozenModels
    (reference ``training_utils.py:253-278``)."""
    vae_state = FrozenModel(
        call=models["vae"]["vae_model"], params=models["vae"]["vae_params"]
    )
    schedulers_state = FrozenModel(
        call=models["schedulers"]["noise_scheduler_object"],
        params=models["schedulers"]["noise_scheduler_state"],
    )
    return {"vae_state": vae_state, "schedulers_state": schedulers_state}


def build_lr_schedule(
    learning_rate: float,
    lr_scheduler: str = "constant",
    warmup_steps: int = 0,
    decay_steps: int = 0,
):
    """LR schedule factory. The reference implements only ``constant``
    (``training_utils.py:355``); ``cosine``/``warmup_cosine`` are new
    capabilities gated behind ``honor_learning_rates``."""
    if lr_scheduler in ("constant", "", None):
        if warmup_steps:
            return optax.linear_schedule(0.0, learning_rate, warmup_steps)
        return optax.constant_schedule(learning_rate)
    if lr_scheduler in ("cosine", "warmup_cosine"):
        if not decay_steps:
            raise ValueError(f"{lr_scheduler!r} requires lr_decay_steps > 0")
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=learning_rate,
            warmup_steps=warmup_steps if lr_scheduler == "warmup_cosine" else 0,
            decay_steps=decay_steps,
        )
    raise ValueError(f"unknown lr_scheduler {lr_scheduler!r}")


def create_lion_optimizer_states(
    models: dict,
    train_unet: bool = True,
    train_text_encoder: bool = True,
    adam_to_lion_scale_factor: float = 7,
    u_net_learning_rate: float = 1e-6,
    text_encoder_learning_rate: float = 1e-6,
    excluded_layer_pattern_from_weight_decay: Optional[list] = None,
    excluded_layer_from_quantization: Optional[list] = None,
    lion_8bit_block_size: Optional[int] = None,
    quantize_unet_state: bool = False,
    quantize_text_encoder_state: bool = False,
    use_pallas_lion: Optional[bool] = None,
    lr_scheduler: str = "constant",
    lr_warmup_steps: int = 0,
    lr_decay_steps: int = 0,
    dense_fsdp_factor: int = 1,
    bucket_max_nb: int = 0,
    compander: str = "exact",
    momentum_layout: str = "auto",
) -> dict:
    """Build clip(1) -> Lion(8-bit or dense) TrainStates on CPU.

    Chain order, betas, decay scaling, and LR division match the reference
    (``training_utils.py:281-427``): lr = configured/scale_factor, decay =
    1e-2*scale_factor, Lion b1=0.9 b2=0.99.
    """
    excluded_layer_pattern_from_weight_decay = (
        excluded_layer_pattern_from_weight_decay or []
    )
    excluded_layer_from_quantization = excluded_layer_from_quantization or []
    unet_state = None
    text_encoder_state = None

    def _decay_mask(params):
        if not excluded_layer_pattern_from_weight_decay:
            return None
        return create_mask(params, excluded_layer_pattern_from_weight_decay)

    def _build(model, params, apply_fn, learning_rate, quantize):
        schedule = build_lr_schedule(
            learning_rate / adam_to_lion_scale_factor,
            lr_scheduler=lr_scheduler,
            warmup_steps=lr_warmup_steps,
            decay_steps=lr_decay_steps,
        )
        decay_mask = _decay_mask(params)
        if quantize:
            quant_mask = create_mask(params, excluded_layer_from_quantization)
            lion = lion_8bit(
                learning_rate=schedule,
                b1=0.9,
                b2=0.99,
                weight_decay=1e-2 * adam_to_lion_scale_factor,
                mask=decay_mask,
                block_size=lion_8bit_block_size,
                excluded_layer_mask=quant_mask,
                use_pallas=use_pallas_lion,
                dense_fsdp_factor=dense_fsdp_factor,
                bucket_max_nb=bucket_max_nb,
                compander=compander,
                momentum_layout=momentum_layout,
            )
        else:
            lion = optax.lion(
                learning_rate=schedule,
                b1=0.9,
                b2=0.99,
                weight_decay=1e-2 * adam_to_lion_scale_factor,
                mask=decay_mask,
            )
        tx = optax.chain(optax.clip_by_global_norm(1), lion)
        # jit the optimizer init (it block-quantizes a zero momentum per leaf;
        # eager per-op dispatch is the slow path, especially on 1-core CPU CI)
        opt_state = jax.jit(tx.init)(params)
        return train_state.TrainState(
            step=0, apply_fn=apply_fn, params=params, tx=tx, opt_state=opt_state
        )

    with jax.default_device(jax.devices("cpu")[0]):
        if train_unet:
            unet_state = _build(
                models["unet"]["unet_model"],
                models["unet"]["unet_params"],
                models["unet"]["unet_model"].apply,
                u_net_learning_rate,
                quantize_unet_state,
            )
        if train_text_encoder:
            text_encoder_state = _build(
                models["text_encoder"]["text_encoder_model"],
                models["text_encoder"]["text_encoder_params"],
                models["text_encoder"]["text_encoder_model"].__call__,
                text_encoder_learning_rate,
                quantize_text_encoder_state,
            )

    return {"unet_state": unet_state, "text_encoder_state": text_encoder_state}


def _state_sharding(tree, mesh: Mesh, fsdp: bool, tp: bool = False):
    """Replicated (reference layout), FSDP-sharded, or TP(+FSDP) placement."""
    if tp and hasattr(tree, "params"):
        from ..parallel.sharding import train_state_tp_sharding

        return train_state_tp_sharding(tree, mesh, fsdp_rest=fsdp)
    if not fsdp:
        return jax.tree_util.tree_map(
            lambda _: NamedSharding(mesh, PartitionSpec()), tree
        )
    if hasattr(tree, "params"):
        # co-shard params + quantized momentum dim-0 where the fused Lion
        # kernel can run shard_map'd (parallel.sharding docstring)
        from ..parallel.sharding import train_state_fsdp_sharding

        return train_state_fsdp_sharding(tree, mesh)
    return params_fsdp_sharding(tree, mesh)


def on_device_model_training_state(
    training_config: TrainingConfig, mesh: Optional[Mesh] = None
):
    """Compose load + optimizer build + device placement.

    Returns the reference 7-tuple (``training_utils.py:493-501``). Reproduces
    the reference's non-forwarding of LRs/scale-factor (hardcoded 7, default
    1e-6 LRs) for bit-for-bit fidelity — SURVEY.md §2.2.
    """
    mesh = mesh or mesh_lib.get_default_mesh()
    fsdp = training_config.fsdp_shard_params
    tp = getattr(training_config, "tensor_parallel_shard_params", False)

    # Pallas kernels are custom calls with no GSPMD partitioning rule, so on
    # sharded meshes they must be explicitly partitioned or avoided:
    # - flash attention: register the mesh so ops.attention runs the kernel
    #   inside shard_map, manual over the batch (dp) and head (tp) axes —
    #   head-local/batch-local kernels, zero collectives (tested by
    #   tests/test_parallel.py::test_tp_flash_attention_no_allgather);
    # - fused Lion: under FSDP the dense momentum layout shards dim-0 in
    #   lockstep with the param (parallel.sharding.train_state_fsdp_sharding)
    #   and eligible leaves run the kernel inside shard_map with zero
    #   collectives (optim.lion8bit.set_lion_fsdp_mesh); shard-misaligned
    #   leaves take the XLA-fused jnp path, which GSPMD partitions
    #   elementwise. Under TP-only (momentum replicated) every quantized
    #   leaf runs the kernel inside an ALL-replicated shard_map
    #   (optim.lion8bit.set_lion_tp_mesh — collective-neutral with the jnp
    #   path, see the _LION_TP_MESH rationale). tp+fsdp keeps the FSDP
    #   momentum plan: dense-eligible momentum is dim-0 co-sharded over
    #   fsdp (parallel.sharding.train_state_tp_sharding fsdp_rest) and runs
    #   the same shard_map'd kernel — GSPMD reshards each Megatron grad to
    #   dim-0 at the optimizer boundary, an inherent cost the jnp path pays
    #   too since new momentum must land fsdp-sharded either way.
    from ..optim.lion8bit import set_lion_fsdp_mesh, set_lion_tp_mesh
    from ..ops.attention import set_attention_mesh

    mesh_sizes = dict(mesh.shape)
    if (
        mesh_sizes.get("data_parallel", 1) > 1
        or mesh_sizes.get("model_parallel", 1) > 1
    ):
        set_attention_mesh(mesh)
    else:
        set_attention_mesh(None)  # idempotent across runs in one process
    set_lion_fsdp_mesh(mesh if fsdp else None)
    set_lion_tp_mesh(mesh if (tp and not fsdp) else None)
    use_pallas_lion = training_config.use_pallas_lion
    dense_fsdp_factor = mesh_sizes.get("fsdp", 1) if fsdp else 1

    models = load_models(training_config=training_config)
    # the reference hardcodes scale 7 and drops the configured LRs
    # (training_utils.py:432-442); honor_learning_rates opts out of that quirk
    lr_kwargs = dict(adam_to_lion_scale_factor=7)
    if training_config.honor_learning_rates:
        lr_kwargs = dict(
            adam_to_lion_scale_factor=training_config.adam_to_lion_scale_factor,
            u_net_learning_rate=training_config.unet_learning_rate,
            text_encoder_learning_rate=(
                training_config.text_encoder_learning_rate
            ),
            lr_scheduler=training_config.lr_scheduler,
            lr_warmup_steps=training_config.lr_warmup_steps,
            lr_decay_steps=training_config.lr_decay_steps,
        )
    trained_model_states = create_lion_optimizer_states(
        models=models,
        train_text_encoder=True,
        train_unet=True,
        **lr_kwargs,
        excluded_layer_pattern_from_weight_decay=(
            training_config.excluded_layer_pattern_from_weight_decay
        ),
        excluded_layer_from_quantization=(
            training_config.excluded_layer_from_quantization
        ),
        lion_8bit_block_size=training_config.quant_block_size,
        quantize_unet_state=training_config.quantize_unet_state,
        quantize_text_encoder_state=training_config.quantize_text_encoder_state,
        use_pallas_lion=use_pallas_lion,
        dense_fsdp_factor=dense_fsdp_factor,
        bucket_max_nb=training_config.lion_bucket_max_nb,
        compander=training_config.lion_compander,
        momentum_layout=training_config.lion_momentum_layout,
    )
    if not training_config.train_text_encoder:
        # frozen text encoder (SDXL-scale runs, BASELINE config 5): keep the
        # TrainState surface the train step expects, but with a no-op
        # optimizer so no momentum memory is allocated
        trained_model_states["text_encoder_state"] = train_state.TrainState.create(
            apply_fn=models["text_encoder"]["text_encoder_model"].__call__,
            params=models["text_encoder"]["text_encoder_params"],
            tx=optax.set_to_zero(),
        )
    frozen_states = create_frozen_states(models=models)

    def _put(tree, fsdp_this: bool = False, tp_this: bool = False):
        if tree is None:
            return None
        shardings = _state_sharding(tree, mesh, fsdp_this, tp_this)
        return jax.tree_util.tree_map(
            lambda leaf, s: jax.device_put(leaf, device=s), tree, shardings
        )

    unet_state = _put(trained_model_states["unet_state"], fsdp, tp)
    text_encoder_state = _put(trained_model_states["text_encoder_state"], fsdp, tp)
    frozen_vae = _put(frozen_states["vae_state"])
    frozen_schedulers = _put(frozen_states["schedulers_state"])

    def _put_copy(tree, fsdp_this: bool = False):
        # EMA buffers must be distinct buffers from the TrainState params —
        # device_put of the same host array aliases, and the train step
        # donates both (same-buffer double donation is an XLA error)
        placed = _put(tree, fsdp_this)
        return jax.tree_util.tree_map(lambda x: x.copy(), placed)

    unet_ema_params = (
        _put_copy(models["unet"]["unet_params"], fsdp)
        if training_config.accumulate_unet_ema
        else None
    )
    text_encoder_ema_params = (
        _put_copy(models["text_encoder"]["text_encoder_params"], fsdp)
        if training_config.accumulate_text_encoder_ema
        else None
    )

    model_object_dict = {
        "unet": models["unet"]["unet_model"],
        "vae": models["vae"]["vae_model"],
        "text_encoder": models["text_encoder"]["text_encoder_model"],
        "schedulers": models["schedulers"]["noise_scheduler_object"],
        "tokenizer": models["tokenizer"],
    }

    return (
        unet_state,
        text_encoder_state,
        unet_ema_params,
        text_encoder_ema_params,
        frozen_vae,
        frozen_schedulers,
        model_object_dict,
    )
