"""firls / remez / gammatone vs the scipy oracle.

firls and gammatone are coefficient-exact.  remez converges to the unique
weighted-Chebyshev optimum: single-band-pair designs match scipy's
coefficients to grid resolution (~1e-4); multiband designs are compared by
the defining criterion — the achieved in-band weighted error must not
exceed scipy's by more than grid tolerance (transition bands are
unconstrained don't-care regions).
"""

from __future__ import annotations

import numpy as np
import pytest
import scipy.signal as ss

from gpu_fft_tpu.ops.fir_optimal import firls, gammatone, remez


# ── firls (exact) ────────────────────────────────────────────────────────────


@pytest.mark.parametrize("args,kwargs", [
    ((31, [0, 0.2, 0.3, 1.0], [1, 1, 0, 0]), {}),
    ((41, [0, 0.3, 0.4, 0.7, 0.8, 1.0], [0, 0, 1, 1, 0, 0]), {"weight": [1, 2, 0.5]}),
    ((21, [0, 10, 20, 50], [1, 0.5, 0, 0]), {"fs": 100}),
    ((15, [0, 0.1, 0.4, 1.0], [1, 1, 0, 0]), {}),
])
def test_firls_matches_scipy(args, kwargs):
    np.testing.assert_allclose(firls(*args, **kwargs), ss.firls(*args, **kwargs),
                               atol=1e-12)


def test_firls_validates():
    with pytest.raises(ValueError):
        firls(20, [0, 0.2, 0.3, 1.0], [1, 1, 0, 0])  # even numtaps
    with pytest.raises(ValueError):
        firls(21, [0, 0.3, 0.2, 1.0], [1, 1, 0, 0])  # decreasing bands


# ── gammatone (exact) ────────────────────────────────────────────────────────


def test_gammatone_fir_matches_scipy():
    b1, a1 = gammatone(440, "fir", fs=16000)
    b2, a2 = ss.gammatone(440, "fir", fs=16000)
    np.testing.assert_allclose(b1, b2, atol=1e-15)
    np.testing.assert_array_equal(a1, a2)
    b1, _ = gammatone(1000, "fir", order=6, numtaps=400, fs=44100)
    b2, _ = ss.gammatone(1000, "fir", order=6, numtaps=400, fs=44100)
    np.testing.assert_allclose(b1, b2, atol=1e-15)


def test_gammatone_iir_matches_scipy():
    b1, a1 = gammatone(440, "iir", fs=16000)
    b2, a2 = ss.gammatone(440, "iir", fs=16000)
    np.testing.assert_allclose(b1, b2, rtol=1e-10)
    np.testing.assert_allclose(a1, a2, rtol=1e-10)


def test_gammatone_validates():
    with pytest.raises(ValueError):
        gammatone(9000, "fir", fs=16000)  # beyond Nyquist
    with pytest.raises(ValueError):
        gammatone(440, "bogus", fs=16000)
    with pytest.raises(ValueError):
        gammatone(440, "fir", order=30, fs=16000)


# ── remez ────────────────────────────────────────────────────────────────────


@pytest.mark.parametrize("numtaps,bands,desired,typ", [
    (21, [0, 0.2, 0.3, 0.5], [1, 0], "bandpass"),       # type I lowpass
    (20, [0, 0.2, 0.3, 0.5], [1, 0], "bandpass"),       # type II
    (31, [0.05, 0.45], [1], "hilbert"),                 # type III
    (32, [0.05, 0.45], [1], "differentiator"),          # type IV
])
def test_remez_coefficients_near_scipy(numtaps, bands, desired, typ):
    o = remez(numtaps, bands, desired, type=typ, fs=1.0)
    r = ss.remez(numtaps, bands, desired, type=typ, fs=1.0)
    np.testing.assert_allclose(o, r, atol=2e-4)


def test_remez_multiband_meets_scipy_ripple():
    # Multiband: compare by the defining min-max criterion, not raw
    # coefficients (the transition bands are unconstrained).
    nt, bands, des = 72, [0, 0.1, 0.2, 0.4, 0.45, 0.5], [0, 1, 0]
    o = remez(nt, bands, des, fs=1.0)
    r = ss.remez(nt, bands, des, fs=1.0)
    grid = np.concatenate([np.linspace(0, 0.1, 2000), np.linspace(0.2, 0.4, 4000),
                           np.linspace(0.45, 0.5, 1500)])
    D = np.concatenate([np.zeros(2000), np.ones(4000), np.zeros(1500)])
    _, Ho = ss.freqz(o, worN=grid * 2 * np.pi)
    _, Hr = ss.freqz(r, worN=grid * 2 * np.pi)
    err_ours = np.abs(np.abs(Ho) - D).max()
    err_scipy = np.abs(np.abs(Hr) - D).max()
    assert err_ours <= err_scipy * 1.02, (err_ours, err_scipy)


def test_remez_equiripple_property():
    # Independent invariant: the passband and stopband peak errors are
    # equal (within grid tolerance) for an equiripple design.
    h = remez(33, [0, 0.2, 0.3, 0.5], [1, 0], fs=1.0)
    pb = np.linspace(0, 0.2, 2000)
    sb = np.linspace(0.3, 0.5, 2000)
    _, Hp = ss.freqz(h, worN=pb * 2 * np.pi)
    _, Hs = ss.freqz(h, worN=sb * 2 * np.pi)
    d_pass = np.abs(np.abs(Hp) - 1).max()
    d_stop = np.abs(Hs).max()
    assert abs(d_pass - d_stop) < 0.05 * max(d_pass, d_stop)


def test_remez_weight_trades_ripple():
    h = remez(33, [0, 0.2, 0.3, 0.5], [1, 0], weight=[1, 10], fs=1.0)
    pb = np.linspace(0, 0.2, 2000)
    sb = np.linspace(0.3, 0.5, 2000)
    _, Hp = ss.freqz(h, worN=pb * 2 * np.pi)
    _, Hs = ss.freqz(h, worN=sb * 2 * np.pi)
    d_pass = np.abs(np.abs(Hp) - 1).max()
    d_stop = np.abs(Hs).max()
    np.testing.assert_allclose(d_pass / d_stop, 10.0, rtol=0.1)


def test_remez_validates():
    with pytest.raises(ValueError):
        remez(2, [0, 0.2, 0.3, 0.5], [1, 0], fs=1.0)
    with pytest.raises(ValueError):
        remez(21, [0, 0.2, 0.3, 0.5], [1, 0], type="bogus", fs=1.0)


def test_wave_e_reachable_from_namespaces():
    import gpu_fft_tpu
    import gpu_fft_tpu.signal as sig

    for mod in (gpu_fft_tpu, sig):
        for name in ("firls", "remez", "gammatone"):
            assert callable(getattr(mod, name)), name
