"""Worker process for the real multi-process jax.distributed test.

Launched by tests/test_parallel.py::TestDistributed with
JAX_COORDINATOR / JAX_NUM_PROCESSES / JAX_PROCESS_ID set.  Joins the
cluster through parallel/launcher.py (the production entry glue), runs a
psum over the *global* device mesh, and prints machine-checkable results.
"""

import os
import sys

# 2 local CPU devices per process -> 4 global devices across 2 processes.
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from stereoreconstruction_tpu.parallel.launcher import (
    initialize_distributed, global_mesh, is_coordinator)


def main():
    assert initialize_distributed() is True, "cluster init returned False"
    n_proc = jax.process_count()
    n_dev = len(jax.devices())
    mesh = global_mesh(n_views=1)

    # psum over every global device: each device contributes its
    # (global device index + 1); total = n_dev * (n_dev + 1) / 2.
    local = jnp.arange(jax.local_device_count(), dtype=jnp.float32)

    def body(x):
        idx = jax.lax.axis_index("row").astype(jnp.float32)
        return jax.lax.psum(idx + 1.0, "row")[None]

    f = jax.jit(jax.shard_map(
        lambda x: body(x), mesh=mesh,
        in_specs=P(("view", "row")), out_specs=P(("view", "row"))))
    arr = jnp.arange(n_dev, dtype=jnp.float32)
    sharded = jax.device_put(
        arr, NamedSharding(mesh, P(("view", "row"))))
    res = f(sharded)
    # a global array spans non-addressable devices; check local shards
    out = np.concatenate([np.asarray(s.data)
                          for s in res.addressable_shards])
    want = n_dev * (n_dev + 1) / 2.0
    ok = bool(np.all(out == want))
    print(f"RESULT pid={jax.process_index()} procs={n_proc} "
          f"devices={n_dev} psum={out[0]:.1f} want={want:.1f} ok={ok}",
          flush=True)
    sys.exit(0 if ok and n_proc == 2 and n_dev == 4 else 1)


if __name__ == "__main__":
    main()
