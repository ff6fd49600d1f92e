"""Worker for the 2-process jax.distributed CPU test (spawned by
tests/test_distributed.py).  Each process owns 2 virtual CPU devices; the
global mesh is 4-wide.  Exercises init_distributed, put_batch and a sharded
train step whose gradients XLA all-reduces across processes."""
import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding  # noqa: E402

from efficient_attention_tpu.parallel import (  # noqa: E402
    batch_spec,
    init_distributed,
    make_mesh,
    put_batch,
)


def main():
    coordinator, num_procs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    ok = init_distributed(coordinator, num_procs, pid)
    assert ok, "init_distributed returned False in multi-process mode"
    assert jax.process_count() == num_procs
    assert len(jax.devices()) == 2 * num_procs, jax.devices()

    mesh = make_mesh(data=-1)
    sharding = NamedSharding(mesh, batch_spec())

    # each process contributes DIFFERENT local rows; the global mean must see
    # all of them (i.e. the collective really crossed process boundaries)
    local = np.full((4, 8), float(pid + 1), np.float32)
    global_batch = put_batch(local, sharding)
    assert global_batch.shape == (4 * num_procs, 8)

    @jax.jit
    def global_mean(x):
        return x.mean()

    got = float(global_mean(global_batch))
    want = float(np.mean([p + 1 for p in range(num_procs) for _ in range(4)]))
    assert abs(got - want) < 1e-6, (got, want)

    # one sharded grad step: dp gradients are averaged across the mesh
    w = jax.device_put(jnp.ones((8,)), NamedSharding(mesh, jax.sharding.PartitionSpec()))

    @jax.jit
    def grad_step(w, x):
        loss_fn = lambda w: jnp.mean((x @ w) ** 2)  # noqa: E731
        return jax.grad(loss_fn)(w)

    g = grad_step(w, global_batch)
    assert np.isfinite(np.asarray(g)).all()
    print(f"DIST_OK pid={pid} mean={got}")


if __name__ == "__main__":
    main()
