"""Depth-map checkpoint/resume (runtime/checkpoint.py) — mid-task resume
the reference lacks (depth maps never persisted, twoviewstereo.cpp:175,197).
"""

import numpy as np
import jax.numpy as jnp

from stereoreconstruction_tpu.config import MultiViewConfig, TwoViewConfig
from stereoreconstruction_tpu.runtime.checkpoint import (
    DepthCheckpoint, config_fingerprint)


class TestDepthCheckpoint:
    def test_roundtrip_preserves_sentinels(self, tmp_path):
        cfg = MultiViewConfig()
        ck = DepthCheckpoint(str(tmp_path), cfg)
        d = np.array([[1.5, np.nan], [np.inf, 42.0]], np.float32)
        ck.save("view0", d)
        got = ck.load("view0")
        assert got.dtype == np.float32
        np.testing.assert_array_equal(np.isnan(got), np.isnan(d))
        np.testing.assert_array_equal(np.isinf(got), np.isinf(d))
        np.testing.assert_array_equal(got[np.isfinite(d)], d[np.isfinite(d)])

    def test_stale_config_rejected(self, tmp_path):
        d = np.ones((2, 2), np.float32)
        DepthCheckpoint(str(tmp_path), MultiViewConfig()).save("v", d)
        other = DepthCheckpoint(str(tmp_path),
                                MultiViewConfig(num_depth_levels=7))
        assert other.load("v") is None
        same = DepthCheckpoint(str(tmp_path), MultiViewConfig())
        assert same.load("v") is not None

    def test_shape_mismatch_rejected(self, tmp_path):
        ck = DepthCheckpoint(str(tmp_path))
        ck.save("v", np.ones((2, 2)))
        assert ck.load("v", expect_shape=(3, 3)) is None
        assert ck.load("v", expect_shape=(2, 2)) is not None

    def test_fingerprints_differ_across_configs(self):
        assert config_fingerprint(MultiViewConfig()) != \
            config_fingerprint(MultiViewConfig(min_depth=1.0))
        assert config_fingerprint(TwoViewConfig()) != \
            config_fingerprint(MultiViewConfig())


class TestMvsResume:
    def test_mvs_resumes_from_checkpoint(self, tmp_path):
        from test_multiview import make_rig
        from stereoreconstruction_tpu.stereo.multiview import mvs_depth_maps

        rng = np.random.default_rng(3)
        cams, _, rgbs, masks = make_rig(rng)
        cfg = MultiViewConfig(min_depth=40.0, max_depth=90.0,
                              num_depth_levels=5, window_radius=1,
                              image_scale=1.0)

        ck = DepthCheckpoint(str(tmp_path), cfg)
        full = np.asarray(mvs_depth_maps(rgbs, masks, cams, cfg,
                                         checkpoint=ck))
        # every view checkpointed
        for i in range(len(cams)):
            assert ck.has(str(i))

        # poison one checkpoint; a resumed run must trust the store
        sentinel = np.full(full.shape[1:], 7.0, np.float32)
        ck.save("1", sentinel)
        resumed = np.asarray(mvs_depth_maps(rgbs, masks, cams, cfg,
                                            checkpoint=ck,
                                            cross_check=False))
        np.testing.assert_array_equal(resumed[1], sentinel)

        # untouched views identical to the from-scratch run (pre cross-check)
        scratch = np.asarray(mvs_depth_maps(rgbs, masks, cams, cfg,
                                            cross_check=False))
        np.testing.assert_array_equal(resumed[0], scratch[0])


class TestPlyMeshAndNormals:
    def test_faces_roundtrip_and_generated_normals(self, tmp_path):
        from stereoreconstruction_tpu.data.ply import (
            read_ply_full, generate_normals)
        # unit right triangle in the z=0 plane (+z normal), one dangling pt
        pts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [5, 5, 5.0]])
        p = tmp_path / "mesh.ply"
        p.write_text(
            "ply\nformat ascii 1.0\n"
            "element vertex 4\n"
            "property float x\nproperty float y\nproperty float z\n"
            "element face 1\n"
            "property list uchar int vertex_indices\n"
            "end_header\n"
            + "\n".join(" ".join(str(v) for v in q) for q in pts)
            + "\n3 0 1 2\n")
        d = read_ply_full(str(p))
        np.testing.assert_allclose(d.points, pts)
        np.testing.assert_array_equal(d.faces, [[0, 1, 2]])

        n = generate_normals(d.points, d.faces)
        np.testing.assert_allclose(n[:3], [[0, 0, 1]] * 3, atol=1e-12)
        # vertex in no face keeps the zero accumulator (reference behavior)
        np.testing.assert_allclose(n[3], [0, 0, 0])

        # point cloud without faces: constant +z
        n2 = generate_normals(pts, None)
        np.testing.assert_allclose(n2, [[0, 0, 1]] * 4)

    def test_binary_faces(self, tmp_path):
        import struct
        from stereoreconstruction_tpu.data.ply import read_ply_full
        pts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        header = (b"ply\nformat binary_little_endian 1.0\n"
                  b"element vertex 3\n"
                  b"property float x\nproperty float y\nproperty float z\n"
                  b"element face 1\n"
                  b"property list uchar int vertex_indices\n"
                  b"end_header\n")
        body = b"".join(struct.pack("<3f", *q) for q in pts)
        body += struct.pack("<B3i", 3, 0, 1, 2)
        p = tmp_path / "bin.ply"
        p.write_bytes(header + body)
        d = read_ply_full(str(p))
        np.testing.assert_allclose(d.points, pts)
        np.testing.assert_array_equal(d.faces, [[0, 1, 2]])
