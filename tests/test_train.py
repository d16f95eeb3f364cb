"""Train core tests: state assembly, fused train step semantics, EMA,
min-SNR/offset/perturbation options, FSDP sharding on the virtual 8-device
mesh, and full-state checkpointing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_diffusion_training_tpu.core import mesh as mesh_lib
from stable_diffusion_training_tpu.train import (
    TrainingConfig,
    on_device_model_training_state,
    train_step,
    training_config_from_dict,
)


def make_config(**overrides) -> TrainingConfig:
    base = dict(
        model_path="tiny",
        batch_size=8,
        learning_rate=1e-4,
        unet_learning_rate=1e-4,
        text_encoder_learning_rate=1e-4,
        lr_scheduler="constant",
        adam_to_lion_scale_factor=7.0,
        compilation_cache_path="/tmp/jax_cache_test",
        keep_compiled_fn_in_cache=False,
        text_encoder_context_window=77,
        context_window_concatenation_count=3,
        aot_compile=True,
        strip_bos_eos_token=True,
        offset_noise_magnitude=0.0,
        min_snr_gamma_magnitude=0.0,
        perturbation_noise_magnitude=0.0,
        image_area_root=[32],
        minimum_axis_length=[32],
        beta_scheduler="zero_snr_scaled_linear",
        prediction_type="v_prediction",
        excluded_layer_pattern_from_weight_decay=["bias", "scale", "embedding"],
        excluded_layer_from_quantization=["bias", "scale", "embedding"],
        quant_block_size=16,
        quantize_unet_state=True,
        quantize_text_encoder_state=True,
        accumulate_unet_ema=True,
        accumulate_text_encoder_ema=True,
        ema_rate=0.999,
        mixed_precision="float32",
        model_family="tiny",
    )
    base.update(overrides)
    return TrainingConfig(**base)


@pytest.fixture(scope="module")
def tiny_states():
    cfg = make_config()
    return cfg, on_device_model_training_state(cfg)


def clone(states):
    """Deep-copy the donatable states (0-3) so tests that donate buffers
    don't consume the shared fixture."""
    copied = tuple(
        jax.tree.map(lambda x: x.copy(), s) if s is not None else None
        for s in states[:4]
    )
    return copied + tuple(states[4:])


_STEP = None


def _jit_step():
    # one shared jit wrapper so identical (shape, statics) calls hit jit's own
    # executable cache instead of recompiling per test
    global _STEP
    if _STEP is None:
        _STEP = jax.jit(
            train_step,
            donate_argnums=(0, 1, 2, 3),
            static_argnames=(
                "strip_bos_eos_token",
                "offset_noise_magnitude",
                "min_snr_gamma_magnitude",
                "perturbation_noise_magnitude",
                "ema_rate",
            ),
        )
    return _STEP


def _batch(seed=0):
    from stable_diffusion_training_tpu.data.memory import synthetic_batch

    return synthetic_batch(8, (32, 32), concat_count=3, vocab_size=1000, seed=seed)


class TestStateAssembly:
    def test_seven_tuple(self, tiny_states):
        _, states = tiny_states
        (unet_state, te_state, unet_ema, te_ema, frozen_vae, frozen_sched, objs) = (
            states
        )
        assert unet_state is not None and te_state is not None
        assert unet_ema is not None and te_ema is not None
        assert frozen_vae.call is objs["vae"]
        assert frozen_sched.call is objs["schedulers"]

    def test_quantized_momentum_present(self, tiny_states):
        _, states = tiny_states
        unet_state = states[0]
        lion_state = unet_state.opt_state[1][0]  # chain: clip -> (lion8bit, ...)
        quant_leaves = [
            m for m in jax.tree.leaves(
                lion_state.mu_quant,
                is_leaf=lambda n: isinstance(n, tuple) and len(n) == 2,
            )
            if isinstance(m, tuple)
        ]
        assert quant_leaves, "no quantized momentum leaves found"
        codes, scales = quant_leaves[0]
        assert codes.dtype == jnp.int8

    def test_ema_is_distinct_buffer(self, tiny_states):
        """Donating params and EMA together must not be a double donation
        (regression: device_put aliasing made XLA reject the train step)."""
        _, states = tiny_states
        unet_state, unet_ema = states[0], states[2]
        for p, e in zip(
            jax.tree.leaves(unet_state.params), jax.tree.leaves(unet_ema)
        ):
            p_ptr = p.addressable_shards[0].data.unsafe_buffer_pointer()
            e_ptr = e.addressable_shards[0].data.unsafe_buffer_pointer()
            assert p_ptr != e_ptr

    def test_config_from_dict_subset(self):
        cfg_dict = make_config().__dict__ | {"extra_runtime_key": 123}
        cfg = training_config_from_dict(cfg_dict)
        assert cfg.batch_size == 8

    def test_config_from_dict_missing_key(self):
        with pytest.raises(KeyError):
            training_config_from_dict({"model_path": "x"})


class TestTrainStep:
    @pytest.mark.slow  # EMA-variant fused-step compile + 4 steps (~160s on 1 core)
    def test_loss_finite_and_decreasing_trend(self, tiny_states):
        _, states = tiny_states
        unet_state, te_state, unet_ema, te_ema, fvae, fsched, _ = clone(states)
        step = _jit_step()
        rng = jax.random.PRNGKey(0)
        batch = _batch()
        losses = []
        for i in range(4):
            (unet_state, te_state, unet_ema, te_ema, metrics, rng) = step(
                unet_state, te_state, unet_ema, te_ema, batch, rng, fvae, fsched,
                strip_bos_eos_token=True,
                offset_noise_magnitude=0.0,
                min_snr_gamma_magnitude=0.0,
                perturbation_noise_magnitude=0.0,
                ema_rate=0.999,
            )
            losses.append(float(metrics["loss"]))
        assert all(np.isfinite(losses))

    @pytest.mark.slow  # three extra fused-step compiles (distinct statics)
    def test_noise_options_change_loss(self, tiny_states):
        _, states = tiny_states
        cfgs = [
            dict(offset_noise_magnitude=0.0, perturbation_noise_magnitude=0.0,
                 min_snr_gamma_magnitude=0.0),
            dict(offset_noise_magnitude=0.3, perturbation_noise_magnitude=0.0,
                 min_snr_gamma_magnitude=0.0),
            dict(offset_noise_magnitude=0.0, perturbation_noise_magnitude=0.3,
                 min_snr_gamma_magnitude=0.0),
            dict(offset_noise_magnitude=0.0, perturbation_noise_magnitude=0.0,
                 min_snr_gamma_magnitude=5.0),
        ]
        losses = []
        for kw in cfgs:
            unet_state, te_state, unet_ema, te_ema, fvae, fsched, _ = clone(states)
            step = _jit_step()
            out = step(
                unet_state, te_state, unet_ema, te_ema, _batch(), jax.random.PRNGKey(7),
                fvae, fsched, strip_bos_eos_token=True, ema_rate=0.0, **kw,
            )
            losses.append(float(out[4]["loss"]))
        assert len(set(np.round(losses, 8))) == len(losses), losses

    @pytest.mark.slow

    def test_ema_semantics(self, tiny_states):
        """EMA must equal rate*old + (1-rate)*new_params after one step."""
        _, states = tiny_states
        unet_state, te_state, unet_ema, te_ema, fvae, fsched, _ = clone(states)
        rate = 0.999  # same static as the trend test -> jit cache hit
        old_ema = jax.tree.map(lambda x: np.asarray(x), unet_ema)
        step = _jit_step()
        new_unet, _, new_ema, _, _, _ = step(
            unet_state, te_state, unet_ema, te_ema, _batch(), jax.random.PRNGKey(3),
            fvae, fsched, strip_bos_eos_token=True,
            offset_noise_magnitude=0.0, min_snr_gamma_magnitude=0.0,
            perturbation_noise_magnitude=0.0, ema_rate=rate,
        )
        expect = jax.tree.map(
            lambda e, p: rate * e + (1 - rate) * np.asarray(p),
            old_ema, new_unet.params,
        )
        for a, b in zip(jax.tree.leaves(expect), jax.tree.leaves(new_ema)):
            np.testing.assert_allclose(a, b, atol=1e-6)

    def test_strip_bos_eos_context_length(self, tiny_states):
        """3x77 windows -> 227 tokens after stripping; 231 without."""
        _, states = tiny_states
        unet_state = states[0]
        captured = {}
        orig_apply = unet_state.apply_fn

        def spy(variables, sample, timesteps, encoder_hidden_states, **kw):
            captured["ctx"] = encoder_hidden_states.shape
            return orig_apply(variables, sample, timesteps, encoder_hidden_states, **kw)

        spied = unet_state.replace(apply_fn=spy)
        te_state, unet_ema, te_ema, fvae, fsched = states[1:6]
        for strip, expect in ((True, 77 * 3 - 4), (False, 77 * 3)):
            # abstract trace only — the spy captures the context shape during
            # tracing, no compile/execute needed
            jax.eval_shape(
                lambda batch, rng: train_step(
                    spied, te_state, unet_ema, te_ema, batch, rng,
                    fvae, fsched, strip_bos_eos_token=strip,
                    offset_noise_magnitude=0.0, min_snr_gamma_magnitude=0.0,
                    perturbation_noise_magnitude=0.0, ema_rate=0.0,
                ),
                _batch(),
                jax.random.PRNGKey(0),
            )
            assert captured["ctx"][1] == expect


class TestFSDP:
    @pytest.mark.slow  # full fused-step compile on the 2x4 virtual mesh
    def test_fsdp_states_sharded_and_step_runs(self, cpu_devices):
        mesh = mesh_lib.create_mesh(
            shape=(2, 4), axis_names=("data_parallel", "fsdp")
        )
        cfg = make_config(fsdp_shard_params=True)
        states = on_device_model_training_state(cfg, mesh=mesh)
        unet_state, te_state, unet_ema, te_ema, fvae, fsched, _ = states
        # at least one param leaf actually sharded over fsdp
        sharded = [
            leaf for leaf in jax.tree.leaves(unet_state.params)
            if any(s is not None for s in leaf.sharding.spec)
        ]
        assert sharded, "no unet param was FSDP-sharded"

        from jax.sharding import NamedSharding, PartitionSpec

        batch = jax.tree.map(
            lambda leaf: jax.device_put(
                leaf,
                NamedSharding(mesh, PartitionSpec("data_parallel")),
            ),
            _batch(),
        )
        step = _jit_step()
        out = step(
            unet_state, te_state, unet_ema, te_ema, batch, jax.random.PRNGKey(0),
            fvae, fsched, strip_bos_eos_token=True,
            offset_noise_magnitude=0.0, min_snr_gamma_magnitude=0.0,
            perturbation_noise_magnitude=0.0, ema_rate=0.999,
        )
        assert np.isfinite(float(out[4]["loss"]))


class TestCheckpoint:
    def test_save_model_diffusers_layout(self, tiny_states, tmp_path):
        import os

        from stable_diffusion_training_tpu.train import save_model

        _, states = tiny_states
        unet_state, te_state, _, _, fvae, _, objs = states
        out = str(tmp_path / "ckpt")
        save_model(
            objs, objs.get("tokenizer"), unet_state.params, te_state.params,
            fvae.params, out,
        )
        for sub in (
            "model_index.json",
            "unet/config.json",
            "unet/diffusion_pytorch_model.safetensors",
            "vae/diffusion_pytorch_model.safetensors",
            "text_encoder/model.safetensors",
            "scheduler/scheduler_config.json",
        ):
            assert os.path.exists(os.path.join(out, sub)), sub

    @pytest.mark.slow

    def test_checkpoint_roundtrip_into_models(self, tiny_states, tmp_path):
        """Save -> load_models -> identical forward output."""
        _, states = tiny_states
        unet_state, te_state, _, _, fvae, _, objs = states
        out = str(tmp_path / "ckpt2")
        from stable_diffusion_training_tpu.train import load_models, save_model

        save_model(objs, None, unet_state.params, te_state.params, fvae.params, out)
        cfg = make_config(model_path=out)
        models = load_models(cfg)

        sample = jnp.ones((1, 8, 8, 4))
        ctx = jnp.ones((1, 77, 32))
        t = jnp.array([5])
        orig_unet = objs["unet"]
        new_unet = models["unet"]["unet_model"]
        a = orig_unet.apply(unet_state.params, sample, t, ctx)
        b = new_unet.apply(models["unet"]["unet_params"], sample, t, ctx)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestGradAccumulation:
    @pytest.mark.slow  # separate fused-step compile (scan over micro-batches)
    def test_accum_runs_and_is_finite(self, tiny_states):
        _, states = tiny_states
        unet_state, te_state, unet_ema, te_ema, fvae, fsched, _ = clone(states)
        step = jax.jit(
            train_step,
            donate_argnums=(0, 1, 2, 3),
            static_argnames=(
                "strip_bos_eos_token", "offset_noise_magnitude",
                "min_snr_gamma_magnitude", "perturbation_noise_magnitude",
                "ema_rate", "grad_accumulation_steps",
            ),
        )
        out = step(
            unet_state, te_state, unet_ema, te_ema, _batch(), jax.random.PRNGKey(11),
            fvae, fsched, strip_bos_eos_token=True,
            offset_noise_magnitude=0.0, min_snr_gamma_magnitude=0.0,
            perturbation_noise_magnitude=0.0, ema_rate=0.0,
            grad_accumulation_steps=4,
        )
        assert np.isfinite(float(out[4]["loss"]))
        # param dtypes preserved after the f32 accumulation
        for p_old, p_new in zip(
            jax.tree.leaves(states[0].params), jax.tree.leaves(out[0].params)
        ):
            assert p_old.dtype == p_new.dtype


class TestLRSchedules:
    """New capability (gated): real LR schedules + honoring configured LRs.
    The reference implements only constant and silently drops the configured
    LRs (training_utils.py:355, 432-442) — default config keeps that quirk."""

    def test_build_lr_schedule_constant(self):
        from stable_diffusion_training_tpu.train import build_lr_schedule

        s = build_lr_schedule(1e-4)
        assert float(s(0)) == pytest.approx(1e-4)
        assert float(s(10_000)) == pytest.approx(1e-4)

    def test_build_lr_schedule_warmup_cosine(self):
        from stable_diffusion_training_tpu.train import build_lr_schedule

        s = build_lr_schedule(
            1e-4, "warmup_cosine", warmup_steps=100, decay_steps=1000
        )
        assert float(s(0)) == pytest.approx(0.0)
        assert float(s(100)) == pytest.approx(1e-4)
        assert float(s(1000)) < float(s(500)) < float(s(100))

    def test_build_lr_schedule_cosine_requires_decay(self):
        from stable_diffusion_training_tpu.train import build_lr_schedule

        with pytest.raises(ValueError):
            build_lr_schedule(1e-4, "cosine")

    @pytest.mark.slow

    def test_honor_learning_rates_changes_update_scale(self):
        """Default (reference quirk): configured LRs ignored -> 1e-6 default;
        honor_learning_rates forwards the 1e-4 config -> ~100x larger step."""
        from stable_diffusion_training_tpu.train import (
            create_lion_optimizer_states,
            load_models,
        )

        def step_delta(honor):
            cfg = make_config(
                honor_learning_rates=honor,
                quantize_unet_state=False,
                quantize_text_encoder_state=False,
            )
            states = on_device_model_training_state(cfg)
            unet_state = states[0]
            grads = jax.tree_util.tree_map(
                lambda p: jnp.ones_like(p), unet_state.params
            )
            new = unet_state.apply_gradients(grads=grads)
            leaf = jax.tree_util.tree_leaves(unet_state.params)[0]
            new_leaf = jax.tree_util.tree_leaves(new.params)[0]
            return float(jnp.abs(new_leaf - leaf).max())

        d_ref = step_delta(False)
        d_honored = step_delta(True)
        # reference path: lr 1e-6/7; honored: 1e-4/7 -> 100x bigger sign step
        assert d_honored == pytest.approx(d_ref * 100, rel=1e-3)


def test_vae_encode_chunk_bitwise_identical():
    """vae_encode_chunk runs the frozen VAE per-sample via lax.map — an
    XLA-strategy lever only; the moments, loss, and updated params must be
    bitwise-identical to the whole-batch encode."""
    import jax

    from stable_diffusion_training_tpu.data.memory import synthetic_batch
    from stable_diffusion_training_tpu.train import (
        on_device_model_training_state,
        train_step,
    )

    cfg = make_config(batch_size=2)
    (unet_state, te_state, _, _, frozen_vae, frozen_sched, _) = (
        on_device_model_training_state(cfg)
    )
    b = synthetic_batch(2, (64, 64), concat_count=1, seed=0, vocab_size=1000)
    b = {k: jnp.asarray(v) for k, v in b.items()}
    static = dict(
        strip_bos_eos_token=True, offset_noise_magnitude=0.0,
        min_snr_gamma_magnitude=0.0, perturbation_noise_magnitude=0.0,
        ema_rate=0.0,
    )
    rng = jax.random.PRNGKey(0)
    outs = []
    for chunk in (0, 1):
        out = jax.jit(
            train_step,
            static_argnames=tuple(static) + ("vae_encode_chunk",),
        )(unet_state, te_state, None, None, b, rng, frozen_vae,
          frozen_sched, vae_encode_chunk=chunk, **static)
        outs.append(out)
    assert float(outs[0][4]["loss"]) == float(outs[1][4]["loss"])
    for a, c in zip(jax.tree_util.tree_leaves(outs[0][0].params),
                    jax.tree_util.tree_leaves(outs[1][0].params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
