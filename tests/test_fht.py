"""Fast Hankel transform (FFTLog) tests — oracle: scipy.fft.fht/ifht/fhtoffset."""

import warnings

import numpy as np
import pytest
import scipy.fft as sf
import scipy.special as sp

import gpu_fft_tpu as gf
from gpu_fft_tpu.ops.fht import _gamma_ratio, _lngamma


def _log_signal(n, dln, rng=None):
    r = np.exp((np.arange(n) - (n - 1) / 2) * dln)
    return (r**1.5 * np.exp(-r * r / 2)).astype(np.float32)


@pytest.mark.parametrize("n", [8, 63, 64, 100, 256])
@pytest.mark.parametrize("mu", [0.0, 0.5, 2.0])
@pytest.mark.parametrize("bias", [0.0, 0.5, -0.25])
def test_fht_matches_scipy(n, mu, bias):
    dln = 0.05
    a = _log_signal(n, dln)
    off = sf.fhtoffset(dln, mu, bias=bias)
    ref = sf.fht(a.astype(np.float64), dln, mu, offset=off, bias=bias)
    got = gf.fht(a, dln, mu, offset=off, bias=bias)
    scale = max(1.0, float(np.abs(ref).max()))
    assert got.shape == (n,)
    assert np.abs(got - ref).max() / scale < 3e-5, f"n={n} mu={mu} bias={bias}"


@pytest.mark.parametrize("n", [63, 64, 100])
@pytest.mark.parametrize("bias", [0.0, 0.5])
def test_ifht_matches_scipy_and_roundtrips(n, bias):
    dln, mu = 0.05, 0.5
    a = _log_signal(n, dln)
    off = sf.fhtoffset(dln, mu, bias=bias)
    A = sf.fht(a.astype(np.float64), dln, mu, offset=off, bias=bias)
    ref = sf.ifht(A, dln, mu, offset=off, bias=bias)
    got = gf.ifht(A.astype(np.float32), dln, mu, offset=off, bias=bias)
    scale = max(1.0, float(np.abs(ref).max()))
    assert np.abs(got - ref).max() / scale < 3e-5
    # our own forward -> inverse recovers the signal
    back = gf.ifht(gf.fht(a, dln, mu, offset=off, bias=bias), dln, mu, offset=off, bias=bias)
    assert np.abs(back - a).max() / np.abs(a).max() < 3e-5


def test_fht_batched_matches_per_row(rng):
    n, dln, mu = 64, 0.1, 1.0
    base = _log_signal(n, dln)
    batch = np.stack([base * s for s in (1.0, -0.5, 2.0)]).reshape(3, 1, n)
    batch = np.broadcast_to(batch, (3, 2, n)).copy()
    got = gf.fht(batch, dln, mu)
    for i in range(3):
        for j in range(2):
            row = gf.fht(batch[i, j], dln, mu)
            assert np.abs(got[i, j] - row).max() < 1e-6


@pytest.mark.parametrize(
    "dln,mu,initial,bias",
    [(0.02, 0.5, 0.0, 0.0), (0.1, 1.0, 0.3, 0.5), (0.01, -0.5, 0.0, -0.25)],
)
def test_fhtoffset_matches_scipy(dln, mu, initial, bias):
    got = gf.fhtoffset(dln, mu, initial=initial, bias=bias)
    ref = sf.fhtoffset(dln, mu, initial=initial, bias=bias)
    assert abs(got - ref) < 1e-12


def test_lngamma_matches_scipy_loggamma():
    y = np.concatenate([[0.0], np.logspace(-3, 4, 30)])
    for re in (-3.3, -0.5, 0.25, 1.0, 7.7):
        z = re + 1j * y
        # compare exp(lngamma) — the branch (a 2*pi*i multiple) is immaterial
        # to every consumer, and exp cancels it.
        err = np.abs(np.exp(_lngamma(z) - sp.loggamma(z)) - 1.0).max()
        assert err < 1e-10, f"re={re}"


def test_gamma_ratio_poles():
    # both poles: Pochhammer limit Gamma(-1)/Gamma(-3) = (-3)(-2) = 6
    assert _gamma_ratio(-1.0, -3.0) == pytest.approx(6.0)
    assert _gamma_ratio(-3.0, -1.0) == pytest.approx(1.0 / 6.0)
    # lone numerator pole -> inf, lone denominator pole -> 0
    assert _gamma_ratio(-2.0, 0.5) == np.inf
    assert _gamma_ratio(0.5, -2.0) == 0.0
    # plain ratio against scipy
    assert _gamma_ratio(2.5, -0.75) == pytest.approx(
        float(sp.gamma(2.5) / sp.gamma(-0.75)), rel=1e-12
    )


def test_singular_transform_warns_and_matches_scipy():
    # mu=-1.5, bias=0.5: xp = 0 is a gamma pole while xm = -0.5 is not ->
    # singular forward transform (a double pole would have a finite limit).
    n, dln, mu, bias = 64, 0.05, -1.5, 0.5
    a = _log_signal(n, dln)
    with pytest.warns(UserWarning, match="singular transform"):
        got = gf.fht(a, dln, mu, bias=bias)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ref = sf.fht(a.astype(np.float64), dln, mu, bias=bias)
    scale = max(1.0, float(np.abs(ref).max()))
    assert np.abs(got - ref).max() / scale < 3e-5


def test_fht_validation():
    with pytest.raises(ValueError, match="non-empty"):
        gf.fht(np.zeros((0,), np.float32), 0.1, 0.0)
    with pytest.raises(ValueError, match="positive log spacing"):
        gf.fht(np.ones(8, np.float32), -0.1, 0.0)
    with pytest.raises(ValueError, match="positive dln"):
        gf.fhtoffset(0.0, 0.5)


def test_fht_device_returns_device_arrays():
    import jax.numpy as jnp

    a = _log_signal(32, 0.1)
    out = gf.fht_device(a, 0.1, 0.5)
    assert isinstance(out, jnp.ndarray)
    back = gf.ifht_device(out, 0.1, 0.5)
    assert np.abs(np.asarray(back) - a).max() < 1e-5
