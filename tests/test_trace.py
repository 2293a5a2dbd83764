"""Tracing/metrics subsystem (runtime/trace.py) — the structured
replacement for the reference's print-only diagnostics (SURVEY §5)."""

import json
import threading

import numpy as np

from stereoreconstruction_tpu.runtime.trace import Tracer


class TestTracer:
    def test_nested_stages_and_report(self):
        tr = Tracer()
        with tr.trace("outer"):
            with tr.trace("inner"):
                pass
            with tr.trace("inner"):
                pass
        rep = tr.report()
        assert rep["stages"]["outer"]["calls"] == 1
        assert rep["stages"]["outer/inner"]["calls"] == 2
        assert rep["stages"]["outer"]["total_s"] >= \
            rep["stages"]["outer/inner"]["total_s"]

    def test_metrics_carry_stage_context(self):
        tr = Tracer()
        with tr.trace("calib"):
            tr.metric("reproj_error", 1.5, "px")
            tr.metric("reproj_error", 0.9, "px")
        assert tr.latest("reproj_error") == 0.9
        assert tr.series("reproj_error") == [1.5, 0.9]
        assert tr.report()["metrics"][0]["stage"] == "calib"

    def test_counters(self):
        tr = Tracer()
        tr.count("boards_detected")
        tr.count("boards_detected", 3)
        assert tr.report()["counters"]["boards_detected"] == 4

    def test_thread_isolation_of_stage_stack(self):
        tr = Tracer()
        seen = {}

        def worker():
            with tr.trace("worker_stage"):
                seen["inside"] = tr.current_stage()

        with tr.trace("main_stage"):
            t = threading.Thread(target=worker)
            t.start()
            t.join()
            assert tr.current_stage() == "main_stage"
        assert seen["inside"] == "worker_stage"
        assert set(tr.report()["stages"]) == {"main_stage", "worker_stage"}

    def test_timeit_decorator_and_json_dump(self, tmp_path):
        tr = Tracer()

        @tr.timeit("fn")
        def f(x):
            return x + 1

        assert f(1) == 2
        p = tmp_path / "trace.json"
        tr.dump_json(str(p))
        rep = json.loads(p.read_text())
        assert rep["stages"]["fn"]["calls"] == 1
        assert tr.summary()

    def test_engines_emit_stage_timers(self):
        # compute_depth_maps should record its three stages on the default
        # tracer (cheap shapes; runs on the test CPU mesh)
        import jax.numpy as jnp
        from stereoreconstruction_tpu.runtime import trace as tracing
        from stereoreconstruction_tpu.config import TwoViewConfig
        from stereoreconstruction_tpu.stereo.twoview import compute_depth_maps
        from test_twoview import make_scene

        tracing.reset()
        rng = np.random.default_rng(0)
        rgb_l, mask_l, rgb_r, mask_r, cam_l, cam_r, _, _ = make_scene(rng)
        cfg = TwoViewConfig(min_depth=40.0, max_depth=90.0,
                            num_depth_levels=6, window_radius=2)
        compute_depth_maps(rgb_l, mask_l, rgb_r, mask_r, cam_l, cam_r, cfg,
                           dtype=jnp.float32)
        stages = tracing.report()["stages"]
        assert "twoview/left" in stages
        assert "twoview/right" in stages
        assert "twoview/cross_check" in stages
        tracing.reset()
