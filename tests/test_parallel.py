"""Sharded/multi-chip paths on the 8-device virtual CPU mesh.

The reference has nothing distributed to mirror (SURVEY §2.4); these tests
validate the TPU scale-out extensions against the single-chip oracle.
"""

import numpy as np
import jax
import pytest
from jax.sharding import Mesh
from conftest import assert_slice_approx

from gpu_fft_tpu.parallel import (
    default_mesh,
    distributed_fft,
    distributed_ifft,
    fft_batch_sharded,
    ifft_batch_sharded,
)


@pytest.fixture(scope="module")
def mesh8():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return default_mesh()


@pytest.fixture(scope="module")
def mesh2x4():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.asarray(devs[:8]).reshape(2, 4), ("dp", "sp"))


def test_fft_batch_sharded_matches_oracle(mesh8, rng):
    x = rng.standard_normal((16, 1024)).astype(np.float32)
    yr, yi = fft_batch_sharded(x, mesh8)
    ref = np.fft.fft(x.astype(np.float64), axis=-1)
    assert np.abs(np.asarray(yr) - ref.real).max() < 1e-2
    assert np.abs(np.asarray(yi) - ref.imag).max() < 1e-2


def test_ifft_batch_sharded_roundtrip(mesh8, rng):
    x = rng.standard_normal((8, 512)).astype(np.float32)
    yr, yi = fft_batch_sharded(x, mesh8)
    rr, ri = ifft_batch_sharded(yr, yi, mesh8)
    assert_slice_approx(np.asarray(rr), x, eps=1e-3, label="sharded roundtrip")
    assert np.abs(np.asarray(ri)).max() < 1e-3


def test_distributed_fft_matches_oracle(mesh2x4, rng):
    # 4096 = 64 x 64, both divisible by sp=4.
    x = rng.standard_normal((4, 4096)).astype(np.float32)
    yr, yi = distributed_fft(x, mesh2x4, sp_axis="sp", dp_axis="dp")
    ref = np.fft.fft(x.astype(np.float64), axis=-1)
    scale = np.abs(ref).max()
    assert np.abs(np.asarray(yr) - ref.real).max() / scale < 1e-5
    assert np.abs(np.asarray(yi) - ref.imag).max() / scale < 1e-5


def test_distributed_roundtrip(mesh2x4, rng):
    x = rng.standard_normal((2, 1024)).astype(np.float32)
    yr, yi = distributed_fft(x, mesh2x4, sp_axis="sp", dp_axis="dp")
    rr, ri = distributed_ifft(yr, yi, mesh2x4, sp_axis="sp", dp_axis="dp")
    assert_slice_approx(np.asarray(rr), x, eps=1e-3, label="distributed roundtrip")
    assert np.abs(np.asarray(ri)).max() < 1e-3


def test_distributed_rejects_bad_factor(mesh2x4):
    with pytest.raises(ValueError):
        # 8 = 2 x 4: n1=2 not divisible by sp=4.
        distributed_fft(np.zeros((1, 8), np.float32), mesh2x4, sp_axis="sp")


def test_distributed_rejects_indivisible_batch(mesh2x4):
    with pytest.raises(ValueError):
        distributed_fft(np.zeros((3, 4096), np.float32), mesh2x4, sp_axis="sp", dp_axis="dp")
