"""Worker for the 2-process jax.distributed test (test_distributed.py).

Runs the SAME data-parallel train-step code path tools/dist_train.sh uses
(jax.distributed.initialize -> global mesh -> sharded batch -> one step),
writes its loss/grad_norm to a JSON file for the driver to compare.
"""

import json
import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]
outfile = sys.argv[4]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

result = {"pid": pid}
try:
    jax.distributed.initialize(f"localhost:{port}", num_processes=nproc,
                               process_id=pid)
    import jax.numpy as jnp  # noqa: E402
    import numpy as np  # noqa: E402
    from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

    from test_models import build_tiny_msvfm  # noqa: E402

    from vfmseg_tpu.parallel.mesh import make_mesh  # noqa: E402
    from vfmseg_tpu.train import (  # noqa: E402
        TrainState, make_optimizer, make_train_step, partition_params,
        trainable_predicate)

    assert len(jax.devices()) == nproc, jax.devices()
    assert len(jax.local_devices()) == 1

    K = jax.random.PRNGKey
    model = build_tiny_msvfm()
    # identical on every process (same keys)
    img = jax.random.normal(K(0), (2 * nproc, 128, 128, 3))
    labels = jax.random.randint(K(1), (2 * nproc, 128, 128), 0, 5)
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

    mesh = make_mesh(data=nproc, model=1)
    repl = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P("data"))

    def to_global(x, sharding):
        x = np.asarray(x)
        if sharding is data_sh:
            local = x[pid * 2:(pid + 1) * 2]
            return jax.make_array_from_process_local_data(
                sharding, local, x.shape)
        return jax.make_array_from_process_local_data(sharding, x, x.shape)

    state = jax.tree_util.tree_map(lambda x: to_global(x, repl), state)
    batch = {"img": to_global(img, data_sh),
             "label": to_global(labels, data_sh)}

    step_fn = make_train_step(model, optimizer, donate=False)
    with jax.set_mesh(mesh):
        new_state, metrics = step_fn(state, batch, K(9))
        result["loss"] = float(metrics["loss"])
        result["grad_norm"] = float(metrics["grad_norm"])
    result["n_devices"] = len(jax.devices())
except Exception as exc:  # noqa: BLE001
    import traceback

    result["error"] = f"{exc}\n{traceback.format_exc()}"

with open(outfile, "w") as f:
    json.dump(result, f)
