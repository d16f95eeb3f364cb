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
