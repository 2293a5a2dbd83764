"""stereoreconstruction_tpu — a TPU-native stereo reconstruction + multi-camera
calibration engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
thegedge/StereoReconstruction (C++/Qt, M.Sc. thesis "Underwater Stereo Matching
and its Calibration", U. Alberta 2011):

* refractive camera model (flat-interface Snell refraction),
* multi-camera rig calibration (Zhang intrinsics + pairwise extrinsics +
  Floyd-Warshall chaining + RANSAC keep-best + Schur-complement BA),
* refractive-interface calibration (LM on ray-ray mismatch),
* dense two-view / multi-view stereo along refractive epipolar geometry with
  adaptive/geodesic support-weight NCC aggregation, WTA or TRW-S optimization,
  cross-checking, and PLY export,
* HDR radiometric calibration and multi-exposure merging.

Everything on the compute path is batched, jittable and shardable over a
``jax.sharding.Mesh``. Double precision is enabled globally because camera
calibration parity with the reference requires f64; hot stereo kernels
explicitly run in f32/bf16.
"""

import jax

jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"
