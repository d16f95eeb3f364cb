"""True multi-process (pod-style) validation of the distributed glue.

Spawns 2 OS processes, each owning 2 virtual CPU devices, connected via
``jax.distributed`` with gloo CPU collectives — the closest no-hardware
analogue of a 2-host TPU pod. Exercises ``initialize_distributed``,
``slice_batch_for_process``, ``put_global_batch``
(``make_array_from_process_local_data``), and a jitted grad whose
data-parallel all-reduce crosses the process boundary.

The reference cannot do any of this: it is single-process by construction
(``/root/reference/training_utils.py:35`` builds the mesh from local
devices only; no ``jax.distributed`` anywhere — SURVEY.md §5.8).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_data_parallel_grad(tmp_path):
    nproc = 2
    port = _free_port()
    child = os.path.join(os.path.dirname(__file__), "mp_child.py")

    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["JAX_PLATFORMS"] = "cpu"
    # children must not inherit the parent pytest's compile-cache lock dir
    env.pop("PYTEST_CURRENT_TEST", None)

    outs = [str(tmp_path / f"proc{i}.json") for i in range(nproc)]
    procs = [
        subprocess.Popen(
            [sys.executable, child, str(i), str(nproc), str(port), outs[i]],
            env=env,
        )
        for i in range(nproc)
    ]
    rcs = [p.wait(timeout=300) for p in procs]
    assert rcs == [0] * nproc, f"child exit codes {rcs}"

    results = [json.load(open(o)) for o in outs]
    # both processes computed the same global loss/grad, equal to the
    # single-process ground truth over the full global batch
    for r in results:
        np.testing.assert_allclose(r["loss"], r["expected_loss"], rtol=1e-6)
    np.testing.assert_allclose(
        results[0]["grad"], results[1]["grad"], rtol=1e-6
    )
    np.testing.assert_allclose(results[0]["loss"], results[1]["loss"])
