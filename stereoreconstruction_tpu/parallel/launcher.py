"""Multi-host launch + global mesh construction.

The reference is a single Qt process whose only parallelism is OpenMP/TBB
row loops (SURVEY §5 "Distributed communication backend"); its TPU-native
equivalent is one JAX process per host joined via ``jax.distributed`` with
SPMD collectives over ICI/DCN.  This module is the entry glue:

* :func:`initialize_distributed` — idempotent `jax.distributed.initialize`
  wrapper with cluster-env autodetection (a no-op for single-process runs,
  so every code path works unchanged on one host).
* :func:`global_mesh` — a (views x rows) `jax.sharding.Mesh` over all
  *global* devices, the axes the stereo engines shard over
  (`parallel/sharding.py`): view pairs are embarrassingly parallel (data
  axis), rows shard each cost volume spatially (the TPU analog of the
  reference's per-row OpenMP loops, twoviewstereo.cpp:265/436).

Typical pod-slice launch (one command per host; ``cli stereo`` calls
:func:`initialize_distributed` on entry and routes to the row-sharded /
depth-sharded engines whenever >1 global device is visible — see
cli.py cmd_stereo and the ``--shard`` flag):

    JAX_COORDINATOR=host0:1234 JAX_NUM_PROCESSES=4 JAX_PROCESS_ID=$i \
        python -m stereoreconstruction_tpu.cli stereo ...
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

_initialized = False


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> bool:
    """Join (or skip joining) a multi-host JAX cluster; returns True when a
    multi-process runtime was initialized.

    Arguments default from ``JAX_COORDINATOR`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID``; on TPU pods `jax.distributed.initialize()` can
    autodetect all three, so setting just ``JAX_COORDINATOR`` (or nothing,
    on Cloud TPU) is enough.  Single-process runs (no coordinator, one
    process) return False without touching the runtime — callers never need
    to branch.
    """
    global _initialized
    if _initialized:
        return True
    coordinator_address = (coordinator_address
                           or os.environ.get("JAX_COORDINATOR"))
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and (num_processes or 1) <= 1:
        return False

    import jax
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    _initialized = True
    return True


def global_mesh(n_views: Optional[int] = None,
                axis_names: Tuple[str, str] = ("view", "row")):
    """(views x rows) Mesh over all global devices.

    ``n_views`` bounds the data axis by the number of concurrent view pairs
    (extra devices fold into the row axis).  With one device the mesh is
    1x1 and shardings become no-ops.
    """
    import jax
    import numpy as np
    from jax.sharding import Mesh

    devs = np.asarray(jax.devices())
    n = len(devs)
    dv = 1
    if n_views is None:
        n_views = n
    for cand in range(min(n_views, n), 0, -1):
        if n % cand == 0:
            dv = cand
            break
    return Mesh(devs.reshape(dv, n // dv), axis_names)


def process_index() -> int:
    import jax
    return jax.process_index()


def is_coordinator() -> bool:
    return process_index() == 0
