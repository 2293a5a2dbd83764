"""Worker for the 2-process row-sharded smoke test (ADVICE r3: the
multi-host device-placement leg of rowshard was untested).

Joins a 2-process CPU cluster (2 local devices each -> a 1x4 global
("view", "row") mesh), runs twoview_pairs_rowsharded on a tiny synthetic
pair, and compares the local shards against the unsharded engine run in
the same process.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from stereoreconstruction_tpu.config import TwoViewConfig, WeightConfig
from stereoreconstruction_tpu.parallel.launcher import (
    initialize_distributed, global_mesh)
from stereoreconstruction_tpu.parallel.rowshard import (
    stack_cameras, twoview_pairs_rowsharded)
from stereoreconstruction_tpu.stereo.twoview import compute_depth_maps
from synth import converging_rig, render_scene


def main():
    assert initialize_distributed() is True
    mesh = global_mesh(n_views=1)

    cfg = TwoViewConfig(window_radius=2, min_depth=45.0, max_depth=80.0,
                        num_depth_levels=8, image_scale=1.0,
                        weights=WeightConfig(kind="geodesic"))
    cams = converging_rig(2, refractive=False)
    rgbs, masks, _ = render_scene(cams, 32, 40, plane_dist=60.0,
                                  enable_refraction=False)

    dl, dr = twoview_pairs_rowsharded(
        mesh, rgbs[0][None], masks[0][None], rgbs[1][None],
        masks[1][None], stack_cameras([cams[0]]),
        stack_cameras([cams[1]]), cfg, method="fast",
        enable_refraction=False)

    ref = compute_depth_maps(rgbs[0], masks[0], rgbs[1], masks[1],
                             cams[0], cams[1], cfg, method="fast",
                             enable_refraction=False)
    want = np.stack([np.asarray(ref.depth_left),
                     np.asarray(ref.depth_right)])

    ok = True
    for got_g, want_i in ((dl, want[0][None]), (dr, want[1][None])):
        for s in got_g.addressable_shards:
            blk = np.asarray(s.data)
            ref_blk = want_i[tuple(s.index)]
            same = ((blk == ref_blk)
                    | (np.isnan(blk) & np.isnan(ref_blk))
                    | (np.isinf(blk) & np.isinf(ref_blk)))
            ok = ok and bool(same.all())
    print(f"RESULT pid={jax.process_index()} devices={len(jax.devices())} "
          f"ok={ok}", flush=True)
    sys.exit(0 if ok and jax.process_count() == 2 else 1)


if __name__ == "__main__":
    main()
