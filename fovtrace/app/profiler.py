"""Per-stage timing + CSV reporting.

TPU counterpart of the reference's measurement harness: GL
GL_TIME_ELAPSED query rings + clock() around each OptiX launch, formatted
into per-frame CSV lines "GB, ms, Geometry, ms, Sampling, ..., FPS,
aperture, ray count" (`REF/main.cpp:16-24,260-374`). Here each stage is a
separately-jitted function timed with block_until_ready; whole-frame FPS
uses the fused end-to-end jit (stage timing is diagnostic, the fused
number is the real one — XLA fuses across stage boundaries).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax


class StageTimer:
    """Accumulates wall-ms per named stage across frames."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}
        self._order: List[str] = []
        self.frame_rows: List[Dict[str, float]] = []
        self._current: Dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str, result=None):
        """Time a stage; pass `result` (a pytree of arrays) to block on it."""
        t0 = time.perf_counter()
        box = {}
        yield box
        out = box.get("result", result)
        if out is not None:
            jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) * 1e3
        self.add(name, ms)

    def add(self, name: str, ms: float) -> None:
        if name not in self.totals:
            self.totals[name] = 0.0
            self.counts[name] = 0
            self._order.append(name)
        self.totals[name] += ms
        self.counts[name] += 1
        self._current[name] = ms

    def end_frame(self, extra: Optional[Dict[str, float]] = None) -> None:
        row = dict(self._current)
        if extra:
            row.update(extra)
        self.frame_rows.append(row)
        self._current = {}

    def means(self) -> Dict[str, float]:
        return {
            k: self.totals[k] / max(1, self.counts[k]) for k in self._order
        }

    # ---- CSV (reference report.csv analog: PrintMSTimes main.cpp:21-24)
    def csv_header(self) -> str:
        keys = self._csv_keys()
        return ",".join(keys)

    def _csv_keys(self) -> List[str]:
        keys: List[str] = []
        for row in self.frame_rows:
            for k in row:
                if k not in keys:
                    keys.append(k)
        return keys

    def write_csv(self, path: str) -> None:
        keys = self._csv_keys()
        with open(path, "w") as f:
            f.write(",".join(keys) + "\n")
            for row in self.frame_rows:
                f.write(",".join(f"{row.get(k, 0.0):.4f}" for k in keys) + "\n")

    def summary(self) -> str:
        m = self.means()
        parts = [f"{k}={v:.2f}ms" for k, v in m.items()]
        return "  ".join(parts)


def trace_profile(path: str):
    """jax.profiler trace context for deep kernel-level inspection
    (the TPU-native upgrade over GL timer queries)."""
    return jax.profiler.trace(path)
