"""Child process for the multi-process (pod) distributed test.

Launched by ``test_multiprocess.py`` N times with 2 virtual CPU devices per
process, connected through ``jax.distributed`` (gloo CPU collectives). Each
process exercises the framework's actual pod glue
(``core/distributed.py``): ``initialize_distributed`` →
``slice_batch_for_process`` → ``put_global_batch`` → a jitted grad step
whose data-parallel gradient all-reduce crosses process boundaries.

The reference is single-process by construction (SURVEY.md §5.8 /
``training_utils.py:35``); this validates the multi-host path it lacks.
"""

import json
import os
import sys


def main() -> None:
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    out_path = sys.argv[4]

    import jax

    jax.config.update("jax_platforms", "cpu")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from stable_diffusion_training_tpu.core.distributed import (
        initialize_distributed,
        put_global_batch,
        slice_batch_for_process,
    )
    from stable_diffusion_training_tpu.core.mesh import create_mesh

    initialize_distributed(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec

    assert jax.process_count() == nproc
    assert jax.device_count() == 2 * nproc, jax.devices()

    mesh = create_mesh(
        shape=(2 * nproc, 1),
        axis_names=("data_parallel", "model_parallel"),
    )

    # the GLOBAL batch every host could see; each host keeps only its slice
    # (per-host data loading: SURVEY.md §5.8 "per-host sharded data loading")
    rng = np.random.default_rng(0)
    global_batch = {
        "pixel_values": rng.standard_normal((4 * nproc, 6)).astype(np.float32),
        "input_ids": np.arange(4 * nproc * 3, dtype=np.int32).reshape(
            4 * nproc, 3
        ),
    }
    local = slice_batch_for_process(global_batch)
    assert local["pixel_values"].shape[0] == 4
    placed = put_global_batch(local, mesh)
    assert placed["pixel_values"].shape == global_batch["pixel_values"].shape

    # replicated params, data sharded on "data_parallel": the grad mean is a
    # cross-process all-reduce emitted by GSPMD over the gloo backend
    w = jax.device_put(
        jnp.ones((6,), jnp.float32), NamedSharding(mesh, PartitionSpec())
    )

    def loss_fn(w, x):
        return jnp.mean((x @ w) ** 2)

    loss, grad = jax.jit(
        jax.value_and_grad(loss_fn),
        out_shardings=(
            NamedSharding(mesh, PartitionSpec()),
            NamedSharding(mesh, PartitionSpec()),
        ),
    )(w, placed["pixel_values"])

    result = {
        "process": pid,
        "loss": float(loss.addressable_data(0)),
        "grad": np.asarray(grad.addressable_data(0)).tolist(),
        # single-process ground truth computed locally from the global batch
        "expected_loss": float(
            np.mean((global_batch["pixel_values"] @ np.ones(6)) ** 2)
        ),
    }
    with open(out_path, "w") as f:
        json.dump(result, f)


if __name__ == "__main__":
    main()
