"""Profiling / roofline accounting (new subsystem — the reference's only
profiling is a commented-out thop.profile import, SURVEY.md §5).

* `trace(logdir)` — context manager around jax.profiler.trace; produces a
  TensorBoard/XProf trace of the wrapped steps.
* `StepTimer` — wall-clock examples/s accounting with compile-step exclusion.
* `roofline(...)` — achieved vs peak FLOP/s & bytes/s for a measured op
  (peaks default to TPU v5e: 197 TFLOP/s bf16, 819 GB/s HBM).

Per-kernel measurements live in tools/bench_kernels.py; the trainers expose
`--profile` to capture a trace of the first training steps.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass

V5E_BF16_TFLOPS = 197.0
V5E_HBM_GBS = 819.0


@contextlib.contextmanager
def trace(logdir: str):
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Examples/s over a window, excluding the first (compile) step."""

    def __init__(self) -> None:
        self._t0: float | None = None
        self._examples = 0
        self._steps = 0

    def step(self, batch_size: int) -> None:
        self._steps += 1
        if self._steps == 1:
            return  # first step includes compile; start the clock after it
        if self._t0 is None:
            self._t0 = time.perf_counter()
            return
        self._examples += batch_size

    @property
    def examples_per_s(self) -> float:
        if self._t0 is None or self._examples == 0:
            return 0.0
        return self._examples / (time.perf_counter() - self._t0)


@dataclass
class Roofline:
    flops: int
    bytes_accessed: int
    seconds: float
    peak_tflops: float = V5E_BF16_TFLOPS
    peak_gbs: float = V5E_HBM_GBS

    @property
    def achieved_tflops(self) -> float:
        return self.flops / self.seconds / 1e12

    @property
    def achieved_gbs(self) -> float:
        return self.bytes_accessed / self.seconds / 1e9

    @property
    def compute_bound(self) -> bool:
        """Operational intensity above the machine-balance ridge point."""
        ridge = self.peak_tflops * 1e12 / (self.peak_gbs * 1e9)
        return self.flops / max(self.bytes_accessed, 1) >= ridge

    @property
    def fraction_of_sol(self) -> float:
        """Achieved fraction of the binding roofline."""
        if self.compute_bound:
            return self.achieved_tflops / self.peak_tflops
        return self.achieved_gbs / self.peak_gbs

    def report(self, name: str) -> str:
        bound = "compute" if self.compute_bound else "memory"
        return (
            f"{name}: {self.seconds * 1e6:.0f}us "
            f"{self.achieved_tflops:.2f} TF/s {self.achieved_gbs:.0f} GB/s "
            f"({bound}-bound, {100 * self.fraction_of_sol:.1f}% of SOL)"
        )
