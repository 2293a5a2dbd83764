"""Asserted scaling-efficiency floor (VERDICT r2 item 9): the row-sharded
engine's HLO-level parallel efficiency at 8 devices must stay >= 0.8 at
the bench row count, so a sharding regression (e.g. an accidental
replication/remat that inflates per-device FLOPs) fails CI.

Efficiency here is the FLOPs model of parallel/scaling.py — per-device
FLOPs of the compiled SPMD module (+ the analytic Pallas-kernel term for
method="pallas").  H must be the bench row count (384): the halo
recompute is `(tile + 2*halo) / tile`, so the floor only holds with
bench-sized tiles.  W/D are shrunk for compile time — both scale every
term linearly and cancel in the ratio.
"""

import jax
import pytest

from stereoreconstruction_tpu.parallel.scaling import (
    analyze_rowshard_scaling)


# CI runs the "fast" arm only: the Pallas arm's efficiency model =
# same XLA-counted warp/weights/cross-check + an ANALYTIC kernel term
# that cannot regress, while its interpret-mode lowering takes >30 min
# to compile at radius 5 on this 2-core host.  SCALING.json records both
# arms (scripts/scaling_analysis.py, run offline each round).
@pytest.mark.parametrize("method", ["fast"])
def test_efficiency_floor_at_8_devices(method):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    rows = analyze_rowshard_scaling(384, 128, 4, (1, 8), method=method)
    assert rows[-1]["n_row"] == 8
    eff = rows[-1]["efficiency"]
    assert eff >= 0.8, f"{method}: efficiency at 8 devices {eff:.3f} < 0.8"
    # communication must stay O(1) in device count (two [H, W] cross-check
    # all-gathers), not grow with the mesh
    b1 = sum(rows[0]["collective_bytes_per_device"].values())
    b8 = sum(rows[-1]["collective_bytes_per_device"].values())
    assert b8 <= max(b1, 1) * 1.5 + 1024, (b1, b8)
