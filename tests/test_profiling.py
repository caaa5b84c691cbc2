import time

import numpy as np
import pytest

import jax.numpy as jnp

from tpt.utils.profiling import StageTimer, device_trace, force_sync, throughput


class TestProfiling:
    def test_stage_timer(self):
        t = StageTimer()
        with t.stage("a"):
            time.sleep(0.01)
        with t.stage("b", result=jnp.ones((8,))):
            time.sleep(0.005)
        with t.stage("a"):
            time.sleep(0.01)
        assert t.counts["a"] == 2
        assert t.totals["a"] > 0.015
        rep = t.report()
        assert "a" in rep and "%" in rep
        assert "a" in t.as_json()

    def test_force_sync(self):
        force_sync({"x": jnp.arange(16), "y": (jnp.ones(()),)})

    def test_device_trace_degrades_gracefully(self, tmp_path):
        with device_trace(str(tmp_path / "trace")):
            _ = jnp.arange(128).sum()

    def test_throughput(self):
        r = throughput(2_000_000, 8_000_000, 0.5)
        assert abs(r["mpaths_per_sec"] - 4.0) < 1e-9
        assert abs(r["mrays_per_sec"] - 16.0) < 1e-9
