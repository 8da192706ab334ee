"""Timing/tracing utility tests (observability layer, SURVEY §5)."""

import pathlib

import jax.numpy as jnp
import pytest

from gpu_fft_tpu.utils import profiling


def test_chained_step_time_positive():
    x = jnp.ones((8, 128), jnp.float32)
    t = profiling.chained_step_time(lambda x: x * 1.0000001, x, k1=2, k2=200, reps=2)
    # Differencing can only bound the floor approximately; the result must at
    # least be a finite small number, not garbage.
    assert -1e-3 < t < 1.0


def test_chained_step_stats_fields():
    x = jnp.ones((8, 128), jnp.float32)
    s = profiling.chained_step_stats(
        lambda x: x * 1.0000001, x, k1=2, k2=200, reps=3, min_span_s=0.005
    )
    assert s.median_s > 0  # positive clamp: never a negative/zero time
    assert s.min_s <= s.median_s <= s.max_s
    assert s.iqr_s >= 0 and s.reps == 3 and s.span >= 198
    assert isinstance(s.suspect, bool)


def test_chained_rejects_bad_ks():
    x = jnp.ones((8, 128), jnp.float32)
    with pytest.raises(ValueError):
        profiling.chained_step_time(lambda x: x, x, k1=10, k2=10)


def test_benchmark_throughput():
    x = jnp.ones((4, 256), jnp.float32)
    r = profiling.benchmark(lambda x: x + 1.0, x, k1=2, k2=100, reps=2)
    assert r.elements == 4 * 256
    assert r.microseconds == r.seconds * 1e6


def test_trace_writes_profile(tmp_path):
    with profiling.trace(str(tmp_path)):
        _ = (jnp.ones((128, 128)) @ jnp.ones((128, 128))).block_until_ready()
    files = list(pathlib.Path(tmp_path).rglob("*"))
    assert files, "profiler trace produced no files"
