"""Timing and tracing utilities — the library's observability layer.

The reference has no in-library profiling; callers time with
``std::time::Instant`` and Criterion handles benchmark statistics (SURVEY §5,
reference ``examples/simple.rs:25-27``, ``benches/fft_bench.rs:71-83``).  The
TPU equivalents live here:

* ``chained_step_time`` — the honest device-timing primitive.  Behind an
  async PJRT transport, ``block_until_ready`` can return before execution
  completes and a host readback costs tens of milliseconds, so per-call
  wall-clock timing measures dispatch, not compute.  This runs x = step(x)
  inside ``lax.fori_loop`` for two iteration counts (a data-dependent chain —
  custom calls cannot be elided or fused away) and differences them:
  steady-state per-step device time, floor-free.
* ``benchmark`` — convenience wrapper returning time + throughput.
* ``trace`` — context manager around ``jax.profiler`` for xprof captures.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass

import numpy as np

__all__ = [
    "chained_step_time",
    "benchmark",
    "BenchResult",
    "trace",
    "fft_forward_step",
    "fft_inverse_step",
    "fft_roundtrip_step",
    "xla_fft_forward_step",
    "xla_fft_inverse_step",
    "xla_fft_roundtrip_step",
]


def chained_step_time(step, x0, k1: int = 50, k2: int = 1050, reps: int = 4) -> float:
    """Median steady-state seconds per ``step(x)`` on device.

    ``step`` must be shape-preserving (its output feeds the next iteration).
    Warm-up compiles are excluded, like Criterion's warm-up phase
    (reference ``fft_bench.rs:71-72``).
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    if k2 <= k1:
        raise ValueError(f"k2 ({k2}) must exceed k1 ({k1})")

    # One compiled program serves every chain length: the trip count is a
    # traced operand (fori_loop lowers to while_loop), which matters here
    # because each compile costs tens of seconds through a remote-compile
    # transport.
    @jax.jit
    def run(x, k):
        return lax.fori_loop(0, k, lambda i, x: step(x), x)

    _ = np.asarray(run(x0, jnp.int32(2)).ravel()[0:1])  # warm-up compile

    def t(k):
        kk = jnp.int32(k)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = np.asarray(run(x0, kk).ravel()[0:1])
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    def measure(k1_, k2_):
        return (t(k2_) - t(k1_)) / (k2_ - k1_)

    sec = measure(k1, k2)
    # Sub-microsecond steps drown in readback-floor noise; re-measure with a
    # 8x longer chain so the signal dominates.
    if sec < 1e-6:
        sec = measure(k1, k1 + 8 * (k2 - k1))
    return sec


@dataclass(frozen=True)
class BenchResult:
    seconds: float
    elements: int

    @property
    def melem_per_s(self) -> float:
        return self.elements / self.seconds / 1e6

    @property
    def microseconds(self) -> float:
        return self.seconds * 1e6


def benchmark(step, x0, elements: int | None = None, **kwargs) -> BenchResult:
    """Time ``step`` with :func:`chained_step_time`; throughput if sized."""
    sec = chained_step_time(step, x0, **kwargs)
    n = elements if elements is not None else int(np.prod(x0.shape))
    return BenchResult(seconds=sec, elements=n)


# ── Shared benchmark step builders ───────────────────────────────────────────
# Shape-preserving steps for chained timing, used by both bench harnesses
# (bench.py and scripts/bench_sweep.py) so their measured pipelines cannot
# drift apart.  Each step rescales its output so chained values stay finite.


def fft_forward_step(n: int):
    """x -> re(FFT(x)) / sqrt(n) through the library transform."""
    import numpy as _np

    from ..kernels.large import transform_any

    s = _np.float32(1.0 / _np.sqrt(n))

    def step(x):
        yr, _ = transform_any(x, None, n, -1)
        return yr * s

    return step


def fft_inverse_step(n: int):
    """x -> re(IFFT(x + 0.5j x)) rescaled, through the library transform."""
    import numpy as _np

    from ..kernels.large import transform_any

    s = _np.float32(1.0 / _np.sqrt(n))

    def step(x):
        yr, _ = transform_any(x, x * _np.float32(0.5), n, +1)
        return yr * s

    return step


def fft_roundtrip_step(n: int):
    """x -> re(IFFT(FFT(x))) with the 1/n inverse normalization."""
    import numpy as _np

    from ..kernels.large import transform_any

    def step(x):
        yr, yi = transform_any(x, None, n, -1)
        rr, _ = transform_any(yr, yi, n, +1)
        return rr * _np.float32(1.0 / n)

    return step


def xla_fft_forward_step(n: int):
    """The vendor-FFT equivalent of :func:`fft_forward_step`."""
    import jax.numpy as jnp
    import numpy as _np

    s = _np.float32(1.0 / _np.sqrt(n))

    def step(x):
        return jnp.real(jnp.fft.fft(x.astype(jnp.complex64))) * s

    return step


def xla_fft_inverse_step(n: int):
    import jax.numpy as jnp
    import numpy as _np

    s = _np.float32(_np.sqrt(n))

    def step(x):
        return jnp.real(jnp.fft.ifft(x.astype(jnp.complex64))) * s

    return step


def xla_fft_roundtrip_step(n: int):
    import jax.numpy as jnp

    def step(x):
        return jnp.real(jnp.fft.ifft(jnp.fft.fft(x.astype(jnp.complex64))))

    return step


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a JAX profiler (xprof/TensorBoard) trace of the enclosed block.

    Usage::

        with profiling.trace("/tmp/fft-trace"):
            gf.fft_device(x)[0].block_until_ready()
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
