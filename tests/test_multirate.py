"""Tests for the multirate family: upfirdn, resample_poly, decimate.

Oracle strategy follows the reference's cross-backend parity pattern
(``tests/parity.rs``): scipy.signal is the numerical truth, with f32-scaled
tolerances.
"""

import numpy as np
import pytest
import scipy.signal

import gpu_fft_tpu as gf

from conftest import assert_slice_approx


# ── upfirdn ──────────────────────────────────────────────────────────────────


@pytest.mark.parametrize(
    "n,lh,up,down",
    [(50, 7, 1, 1), (100, 31, 3, 1), (100, 31, 1, 4), (257, 33, 3, 5), (1000, 64, 7, 3)],
)
def test_upfirdn_matches_scipy(rng, n, lh, up, down):
    x = rng.standard_normal(n).astype(np.float32)
    h = rng.standard_normal(lh).astype(np.float32)
    got = gf.upfirdn(h, x, up, down)
    ref = scipy.signal.upfirdn(h.astype(np.float64), x.astype(np.float64), up, down)
    assert got.shape == ref.shape
    scale = max(1.0, np.abs(ref).max())
    assert_slice_approx(got / scale, ref / scale, 2e-3, f"upfirdn {up}/{down}")


def test_upfirdn_batched_and_jit(rng):
    import jax

    x = rng.standard_normal((3, 500)).astype(np.float32)
    h = rng.standard_normal(21).astype(np.float32)
    f = jax.jit(lambda a: gf.upfirdn_device(h, a, 2, 3))
    out = np.asarray(f(x))
    for i in range(3):
        ref = scipy.signal.upfirdn(h.astype(np.float64), x[i].astype(np.float64), 2, 3)
        scale = max(1.0, np.abs(ref).max())
        assert_slice_approx(out[i] / scale, ref / scale, 2e-3, f"upfirdn row {i}")


def test_upfirdn_contract_errors(rng):
    with pytest.raises(ValueError):
        gf.upfirdn([], [1.0, 2.0])
    with pytest.raises(ValueError):
        gf.upfirdn([1.0], [1.0, 2.0], up=0)
    with pytest.raises(ValueError):
        gf.upfirdn([1.0], np.zeros((2, 0), np.float32))


# ── resample_poly ────────────────────────────────────────────────────────────


@pytest.mark.parametrize(
    "n,up,down",
    [(1000, 2, 1), (1000, 1, 2), (1000, 3, 5), (777, 7, 3), (1024, 160, 441), (500, 4, 4)],
)
def test_resample_poly_matches_scipy(rng, n, up, down):
    x = rng.standard_normal(n).astype(np.float32)
    got = gf.resample_poly(x, up, down)
    ref = scipy.signal.resample_poly(x.astype(np.float64), up, down)
    assert got.shape == ref.shape
    scale = max(1.0, np.abs(ref).max())
    assert_slice_approx(got / scale, ref / scale, 2e-3, f"resample_poly {up}/{down}")


def test_resample_poly_array_window_matches_scipy(rng):
    x = rng.standard_normal(999).astype(np.float32)
    h = scipy.signal.firwin(41, 0.2)
    got = gf.resample_poly(x, 2, 3, window=h)
    ref = scipy.signal.resample_poly(x.astype(np.float64), 2, 3, window=h)
    scale = max(1.0, np.abs(ref).max())
    assert_slice_approx(got / scale, ref / scale, 2e-3, "array window")


def test_resample_poly_preserves_tone(rng):
    # A band-limited tone survives 44.1k -> 16k resampling.
    fs, f0 = 44100.0, 1000.0
    t = np.arange(44100) / fs
    x = np.sin(2 * np.pi * f0 * t).astype(np.float32)
    y = gf.resample_poly(x, 160, 441)
    t2 = np.arange(y.shape[0]) * (441 / 160) / fs
    core = slice(200, -200)
    assert_slice_approx(y[core], np.sin(2 * np.pi * f0 * t2)[core].astype(np.float32),
                        5e-3, "44.1k->16k tone")


def test_resample_poly_batched(rng):
    x = rng.standard_normal((4, 600)).astype(np.float32)
    out = np.asarray(gf.resample_poly_device(x, 3, 2))
    assert out.shape == (4, 900)
    for i in range(4):
        ref = scipy.signal.resample_poly(x[i].astype(np.float64), 3, 2)
        scale = max(1.0, np.abs(ref).max())
        assert_slice_approx(out[i] / scale, ref / scale, 2e-3, f"row {i}")


def test_resample_poly_contract_errors(rng):
    with pytest.raises(ValueError):
        gf.resample_poly([1.0, 2.0], 0, 1)
    with pytest.raises(ValueError):
        gf.resample_poly(np.zeros(0, np.float32), 2, 1)
    with pytest.raises(ValueError):
        gf.resample_poly([1.0, 2.0], 2, 1, window=np.zeros((2, 2)))


# ── decimate ─────────────────────────────────────────────────────────────────


@pytest.mark.parametrize("q", [2, 5, 13])
@pytest.mark.parametrize("zero_phase", [True, False])
def test_decimate_matches_scipy(rng, q, zero_phase):
    x = rng.standard_normal(2048).astype(np.float32)
    got = gf.decimate(x, q, ftype="fir", zero_phase=zero_phase)
    ref = scipy.signal.decimate(x.astype(np.float64), q, ftype="fir", zero_phase=zero_phase)
    assert got.shape == ref.shape
    scale = max(1.0, np.abs(ref).max())
    assert_slice_approx(got / scale, ref / scale, 2e-3, f"decimate q={q} zp={zero_phase}")


def test_decimate_custom_order(rng):
    x = rng.standard_normal(1500).astype(np.float32)
    got = gf.decimate(x, 4, n=60, ftype="fir")
    ref = scipy.signal.decimate(x.astype(np.float64), 4, n=60, ftype="fir")
    scale = max(1.0, np.abs(ref).max())
    assert_slice_approx(got / scale, ref / scale, 2e-3, "decimate n=60")


def test_decimate_contract_errors():
    with pytest.raises(ValueError):
        gf.decimate(np.zeros(0, np.float32), 2)
    with pytest.raises(ValueError):
        gf.decimate(np.ones(10, np.float32), 0)
    assert gf.decimate(np.arange(5, dtype=np.float32), 1).tolist() == [0, 1, 2, 3, 4]
