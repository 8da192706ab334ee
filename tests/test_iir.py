"""IIR block-state engine vs the scipy oracle (`tests/parity.rs` pattern).

The block decomposition must be EXACT in exact arithmetic — every
difference from scipy is f32 rounding in the device convolutions — so
tolerances here are small multiples of f32 epsilon times the signal
scale, across filter orders, block boundaries, states, and axes.
"""

from __future__ import annotations

import numpy as np
import pytest
import scipy.signal as ss

from gpu_fft_tpu.ops.iir import filtfilt, lfilter, lfilter_zi, sosfilt


def _sig(n=5000, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(n).astype(np.float64)


@pytest.mark.parametrize("order", [1, 2, 4, 6])
@pytest.mark.parametrize("n", [7, 100, 1024, 5000])
def test_lfilter_matches_scipy_butter(order, n):
    b, a = ss.butter(order, 0.2)
    x = _sig(n, seed=order)
    ours = lfilter(b, a, x)
    ref = ss.lfilter(b, a, x)
    np.testing.assert_allclose(ours, ref, atol=2e-4 * max(1.0, np.abs(ref).max()))


def test_lfilter_pure_fir_and_scalar():
    x = _sig(300, seed=9)
    h = ss.firwin(9, 0.3)
    np.testing.assert_allclose(lfilter(h, [1.0], x), ss.lfilter(h, [1.0], x), atol=1e-5)
    np.testing.assert_allclose(lfilter([2.5], [0.5], x), 5.0 * x, atol=1e-4)


def test_lfilter_zi_matches_scipy():
    for order in (1, 2, 5):
        b, a = ss.butter(order, 0.3)
        np.testing.assert_allclose(lfilter_zi(b, a), ss.lfilter_zi(b, a), atol=1e-10)


def test_lfilter_with_zi_and_zf_roundtrip():
    b, a = ss.butter(3, 0.25)
    x = _sig(2000, seed=3)
    zi = ss.lfilter_zi(b, a) * x[0]
    ours, ozf = lfilter(b, a, x, zi=zi)
    ref, rzf = ss.lfilter(b, a, x, zi=zi)
    np.testing.assert_allclose(ours, ref, atol=2e-4)
    np.testing.assert_allclose(ozf, rzf, atol=2e-4)


@pytest.mark.parametrize("split", [1, 777, 1024, 1999])
def test_streaming_equals_one_shot(split):
    # Filtering in two chunks with the returned state must equal one call —
    # the zf-at-sample-n path (partial trailing blocks) is exact.
    b, a = ss.butter(4, 0.15)
    x = _sig(2000, seed=4)
    zi = np.zeros(4)
    y1, zf = lfilter(b, a, x[:split], zi=zi)
    y2, _ = lfilter(b, a, x[split:], zi=zf)
    whole = lfilter(b, a, x)
    np.testing.assert_allclose(np.concatenate([y1, y2]), whole, atol=5e-4)


def test_lfilter_axis_and_batch():
    b, a = ss.butter(2, 0.4)
    x = np.stack([_sig(600, seed=5), _sig(600, seed=6), _sig(600, seed=7)])
    np.testing.assert_allclose(lfilter(b, a, x, axis=-1), ss.lfilter(b, a, x, axis=-1), atol=2e-4)
    np.testing.assert_allclose(
        lfilter(b, a, x.T, axis=0), ss.lfilter(b, a, x.T, axis=0), atol=2e-4
    )


@pytest.mark.parametrize("padtype", ["odd", "even", "constant", None])
def test_filtfilt_matches_scipy(padtype):
    b, a = ss.butter(3, 0.2)
    x = _sig(1500, seed=8)
    ours = filtfilt(b, a, x, padtype=padtype)
    ref = ss.filtfilt(b, a, x, padtype=padtype)
    np.testing.assert_allclose(ours, ref, atol=5e-4)


def test_filtfilt_batch_rows():
    b, a = ss.butter(2, 0.3)
    x = np.stack([_sig(800, seed=10), _sig(800, seed=11)])
    np.testing.assert_allclose(filtfilt(b, a, x), ss.filtfilt(b, a, x), atol=5e-4)


def test_sosfilt_matches_scipy():
    sos = ss.butter(6, 0.2, output="sos")
    x = _sig(3000, seed=12)
    np.testing.assert_allclose(sosfilt(sos, x), ss.sosfilt(sos, x), atol=5e-4)


def test_sosfilt_with_zi():
    sos = ss.butter(4, 0.3, output="sos")
    x = _sig(1000, seed=13)
    zi = ss.sosfilt_zi(sos) * x[0]
    ours, ozf = sosfilt(sos, x, zi=zi)
    ref, rzf = ss.sosfilt(sos, x, zi=zi)
    np.testing.assert_allclose(ours, ref, atol=5e-4)
    np.testing.assert_allclose(ozf, rzf, atol=5e-4)


def test_validation():
    with pytest.raises(ValueError):
        lfilter([1.0], [0.0, 1.0], np.zeros(8))  # a[0] == 0
    with pytest.raises(ValueError):
        filtfilt(*ss.butter(2, 0.2), np.zeros(5))  # padlen >= n
    with pytest.raises(ValueError):
        sosfilt(np.zeros((2, 5)), np.zeros(8))  # bad sos shape
    with pytest.raises(ValueError):
        filtfilt(*ss.butter(2, 0.2), _sig(100), padtype="bogus")


def test_lfilter_device_jit_composable():
    import jax
    import jax.numpy as jnp

    from gpu_fft_tpu.ops.iir import lfilter_device

    b, a = ss.butter(2, 0.2)
    x = jnp.asarray(_sig(512, seed=14), dtype=jnp.float32)

    @jax.jit
    def f(v):
        return lfilter_device(b, a, v)

    np.testing.assert_allclose(np.asarray(f(x)), ss.lfilter(b, a, np.asarray(x)), atol=2e-4)


def test_sosfilt_zi_matches_scipy():
    from gpu_fft_tpu.ops.iir import sosfilt_zi

    for order in (2, 4, 6):
        sos = ss.butter(order, 0.2, output="sos")
        np.testing.assert_allclose(sosfilt_zi(sos), ss.sosfilt_zi(sos), atol=1e-10)


def test_sosfiltfilt_matches_scipy():
    from gpu_fft_tpu.ops.iir import sosfiltfilt

    sos = ss.butter(6, 0.2, output="sos")
    x = _sig(1500, seed=20)
    np.testing.assert_allclose(sosfiltfilt(sos, x), ss.sosfiltfilt(sos, x), atol=5e-5)
    x2 = np.stack([x, x[::-1]])
    np.testing.assert_allclose(sosfiltfilt(sos, x2), ss.sosfiltfilt(sos, x2), atol=5e-5)
    with pytest.raises(ValueError):
        sosfiltfilt(sos, x[:10])  # padlen >= n


def test_decimate_iir_matches_scipy():
    from gpu_fft_tpu.ops.multirate import decimate

    x = _sig(4000, seed=21).astype(np.float32)
    for q in (2, 4, 7, 10):
        got = decimate(x, q)  # scipy's default: ftype='iir', zero_phase
        ref = ss.decimate(x.astype(np.float64), q)
        np.testing.assert_allclose(got, ref, atol=2e-5, err_msg=f"q={q}")
    got = decimate(x, 4, zero_phase=False)
    ref = ss.decimate(x.astype(np.float64), 4, zero_phase=False)
    np.testing.assert_allclose(got, ref, atol=2e-5)
    with pytest.raises(ValueError):
        decimate(x, 4, ftype="invalid")
