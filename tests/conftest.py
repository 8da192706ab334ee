"""Test harness configuration.

Tests run on an 8-device virtual CPU mesh (TPU hardware is not assumed in
CI): Pallas kernels execute in interpreter mode, sharding tests get 8 real
XLA devices.  The same code paths compile natively on TPU — ``bench.py``'s
Mosaic smoke suite exercises them on hardware every bench run, and setting
``GPU_FFT_TPU_TEST_PLATFORM=<tpu platform>`` runs this whole suite there.

Mirrors the reference's test fixture (`tests/common/mod.rs`): EPSILON = 1e-3
absolute tolerance, labeled approx asserts.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
# Default: run on the virtual CPU mesh.  Set GPU_FFT_TPU_TEST_PLATFORM=tpu to
# run the suite against real hardware (the reference's tests-run-on-real-GPU
# model, SURVEY §4); sharding tests then skip if fewer than 8 devices exist.
_platform = os.environ.get("GPU_FFT_TPU_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
import jax  # noqa: E402

# Some PJRT plugins force-register regardless of JAX_PLATFORMS, so the
# override must also go through jax.config before first backend use.
jax.config.update("jax_platforms", _platform)

if _platform != "cpu":
    # On-hardware runs pay tens of seconds per first-compile through the
    # remote-compile transport; the persistent cache makes repeat suite
    # runs take minutes instead of an hour.
    from gpu_fft_tpu.config import enable_compilation_cache  # noqa: E402

    enable_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Reference tolerance: tests/common/mod.rs:6.
EPSILON = 1e-3


def assert_approx(actual, expected, eps=EPSILON, label=""):
    actual = float(actual)
    expected = float(expected)
    assert abs(actual - expected) <= eps, (
        f"{label}: {actual} != {expected} (diff {abs(actual - expected):.3e} > {eps})"
    )


def assert_slice_approx(actual, expected, eps=EPSILON, label=""):
    a = np.asarray(actual, dtype=np.float64)
    e = np.asarray(expected, dtype=np.float64)
    assert a.shape == e.shape, f"{label}: shape {a.shape} != {e.shape}"
    diff = np.abs(a - e)
    idx = int(np.argmax(diff)) if diff.size else 0
    assert diff.size == 0 or diff.max() <= eps, (
        f"{label}: max diff {diff.max():.3e} > {eps} at index {idx} "
        f"({a.flat[idx]} vs {e.flat[idx]})"
    )


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
