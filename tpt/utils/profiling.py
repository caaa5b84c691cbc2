"""Profiling / tracing harness — the TPU counterpart of the reference's
cudaEvent timing + Nsight workflow (SURVEY.md §5): per-stage wall timing
with real device sync, paths/s / MRays/s derivation, and optional
jax.profiler traces for xprof.

On this runtime `block_until_ready` does not reliably block (async relay),
so StageTimer forces a tiny host fetch of each result instead.
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import numpy as np


def force_sync(tree) -> None:
    """Reliably wait for a pytree result (fetch one element of each leaf)."""
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "shape"):
            arr = leaf.reshape(-1)[:1] if getattr(leaf, "ndim", 0) else leaf
            np.asarray(jax.device_get(arr))


@dataclass
class StageTimer:
    """Accumulating per-stage timer.

    with timer.stage("trace_ext", result=hit): ...
    """

    totals: Dict[str, float] = field(default_factory=dict)
    counts: Dict[str, int] = field(default_factory=dict)

    @contextlib.contextmanager
    def stage(self, name: str, result=None):
        t0 = time.perf_counter()
        holder = {}
        yield holder
        sync_target = holder.get("result", result)
        if sync_target is not None:
            force_sync(sync_target)
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        total = sum(self.totals.values()) or 1e-12
        lines = []
        for name, t in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            lines.append(f"{name:24s} {t * 1000:9.1f} ms  "
                         f"{t / total * 100:5.1f}%  x{self.counts[name]}")
        return "\n".join(lines)

    def as_json(self) -> str:
        return json.dumps({k: round(v, 6) for k, v in self.totals.items()})


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/tpt_trace"):
    """jax.profiler trace for xprof/tensorboard (best effort: profiling may
    be unsupported on relay-attached devices; degrades to a no-op)."""
    started = False
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        pass
    try:
        yield log_dir
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


def throughput(num_paths: int, num_rays: int, seconds: float) -> dict:
    """MRays/s + Mpaths/s like the reference GUI counters
    (pathtrace_wavefront.cu:371-380)."""
    return {
        "mpaths_per_sec": num_paths / seconds / 1e6,
        "mrays_per_sec": num_rays / seconds / 1e6,
        "ms_per_frame": seconds * 1000.0,
    }
