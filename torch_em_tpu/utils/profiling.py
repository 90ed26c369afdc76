"""Profiling helpers: jax.profiler trace hooks and step-time / MFU counters
(SURVEY.md §5.1 — the reference only surfaces s/it in its progress bar;
TPU training additionally needs trace capture and an MFU counter).
"""

import contextlib
import time
from typing import Optional

import jax

__all__ = ["trace", "estimate_step_flops", "peak_flops", "mfu", "StepTimer"]

# bf16 peak FLOP/s per chip by device kind (from public TPU specs)
_PEAK_BF16 = {
    "TPU v2": 45e12,
    "TPU v3": 123e12,
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace of the enclosed block (view with
    tensorboard or Perfetto)."""
    with jax.profiler.trace(logdir):
        yield


def estimate_step_flops(jitted_fn, *args, **kwargs) -> Optional[float]:
    """FLOPs per invocation of a jitted function via compiled cost analysis.
    Returns None when the backend provides no estimate."""
    try:
        cost = jitted_fn.lower(*args, **kwargs).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0)) or None
    except Exception:
        return None


def peak_flops(device=None) -> Optional[float]:
    """bf16 peak FLOP/s of a device (defaults to the first jax device)."""
    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", str(device))
    for name, peak in _PEAK_BF16.items():
        if kind.startswith(name) or name in str(kind):
            return peak
    return None


def mfu(flops_per_step: float, s_per_iter: float, device=None) -> Optional[float]:
    """Model FLOPs utilization: achieved FLOP/s over the chip's bf16 peak."""
    peak = peak_flops(device)
    if peak is None or not flops_per_step or not s_per_iter:
        return None
    return (flops_per_step / s_per_iter) / peak


class StepTimer:
    """Running mean/max step-time counter with a small warmup skip."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.n = 0
        self.total = 0.0
        self.max = 0.0
        self._t = None

    def start(self):
        self._t = time.perf_counter()

    def stop(self):
        dt = time.perf_counter() - self._t
        self.n += 1
        if self.n > self.warmup:
            self.total += dt
            self.max = max(self.max, dt)
        return dt

    @property
    def mean(self):
        return self.total / max(self.n - self.warmup, 1)
