"""Multi-process jax.distributed data parallelism, exercised for real
(VERDICT r2 item 5): two local processes, one device each, form a global
2-device mesh over the distributed runtime (gloo CPU collectives) and run
one DP train step through the same code path tools/dist_train.sh uses.
The loss must equal the single-process step on the same global batch —
the reference analogue is torch.distributed.launch (tools/dist_train.sh:9-17).
"""

import json
import os
import socket
import subprocess
import sys
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

K = jax.random.PRNGKey


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _single_process_loss():
    from test_models import build_tiny_msvfm

    from vfmseg_tpu.train import (
        TrainState, make_optimizer, make_train_step, partition_params,
        trainable_predicate)

    model = build_tiny_msvfm()
    img = jax.random.normal(K(0), (4, 128, 128, 3))
    labels = jax.random.randint(K(1), (4, 128, 128), 0, 5)
    variables = model.init(
        {"params": K(2), "crop": K(3), "mask": K(4), "dropout": K(5)},
        img[:1], labels[:1])
    trainable, frozen = partition_params(variables["params"],
                                         trainable_predicate())
    optimizer = make_optimizer(trainable, base_lr=1e-3, max_steps=10)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), trainable=trainable, frozen=frozen,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=optimizer.init(trainable))
    step_fn = make_train_step(model, optimizer, donate=False)
    _, metrics = step_fn(state, {"img": img, "label": labels}, K(9))
    return float(metrics["loss"]), float(metrics["grad_norm"])


def test_two_process_dp_step_matches_single_process(tmp_path):
    nproc = 2
    port = _free_port()
    worker = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "dist_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_PLATFORM_NAME")}
    procs, outs = [], []
    for pid in range(nproc):
        out = str(tmp_path / f"worker{pid}.json")
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, worker, str(pid), str(nproc), str(port), out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    try:
        # generous: two cold jax processes compile a full train step; under
        # a loaded machine (parallel suite + bench) 420s has been exceeded
        for p in procs:
            p.wait(timeout=900)
    finally:
        for p in procs:
            p.kill()

    results = []
    for out, p in zip(outs, procs):
        assert os.path.exists(out), (
            f"worker wrote no result; stderr:\n"
            f"{p.stderr.read().decode()[-2000:]}")
        with open(out) as f:
            results.append(json.load(f))
    for r in results:
        if "error" in r and ("UNIMPLEMENTED" in r["error"]
                             or "not supported" in r["error"]):
            pytest.skip(f"distributed runtime unavailable: {r['error'][:200]}")
        assert "error" not in r, r.get("error")
        assert r["n_devices"] == nproc

    ref_loss, ref_gn = _single_process_loss()
    for r in results:
        np.testing.assert_allclose(r["loss"], ref_loss, rtol=1e-5)
        np.testing.assert_allclose(r["grad_norm"], ref_gn, rtol=1e-3)
