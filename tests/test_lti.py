"""LTI system toolkit vs the scipy oracle.

Conversions are coefficient-exact; simulations share scipy's exact
per-step matrix-exponential propagation, so outputs agree to f64
roundoff.  place_poles gains are not unique across implementations, so
the invariant checked is the defining one: eig(A − BK) = requested poles.
"""

from __future__ import annotations

import numpy as np
import pytest
import scipy.linalg as sl
import scipy.signal as ss

from gpu_fft_tpu.ops import lti as L

RNG = np.random.default_rng(11)
T = np.linspace(0, 5, 101)
SYS_TF = ([1.0, 2.0], [1.0, 2.0, 5.0])
SYS_SS = tuple(np.asarray(m, dtype=np.float64) for m in ss.tf2ss(*SYS_TF))
DSYS = ([0.5, 0.25], [1.0, -0.6], 0.1)


# ── expm ─────────────────────────────────────────────────────────────────────


@pytest.mark.parametrize("n", [1, 3, 6, 10])
def test_expm_matches_scipy(n):
    A = RNG.standard_normal((n, n)) * 3
    ref = sl.expm(A)
    np.testing.assert_allclose(L.expm(A), ref, rtol=1e-11, atol=1e-12 * np.abs(ref).max())


def test_expm_large_norm_scaling():
    A = RNG.standard_normal((4, 4)) * 40  # forces several squaring steps
    ref = sl.expm(A)
    np.testing.assert_allclose(L.expm(A), ref, rtol=1e-9, atol=1e-9 * np.abs(ref).max())


# ── conversions ──────────────────────────────────────────────────────────────


def test_tf2ss_ss2tf_match_scipy():
    num, den = [1.0, 3.0, 3.0], [1.0, 2.0, 1.0]
    for o, r in zip(L.tf2ss(num, den), ss.tf2ss(num, den)):
        np.testing.assert_allclose(o, r, atol=1e-14)
    n1, d1 = L.ss2tf(*SYS_SS)
    n2, d2 = ss.ss2tf(*SYS_SS)
    np.testing.assert_allclose(n1, n2, atol=1e-12)
    np.testing.assert_allclose(d1, d2, atol=1e-12)


def test_zpk_ss_roundtrip():
    z, p, k = ss.butter(3, 0.5, output="zpk")
    for o, r in zip(L.zpk2ss(z, p, k), ss.zpk2ss(z, p, k)):
        np.testing.assert_allclose(o, r, atol=1e-12)
    z1, p1, k1 = L.ss2zpk(*SYS_SS)
    z2, p2, k2 = ss.ss2zpk(*SYS_SS)
    np.testing.assert_allclose(np.sort_complex(p1), np.sort_complex(np.atleast_1d(p2)),
                               atol=1e-10)
    np.testing.assert_allclose(k1, k2, atol=1e-10)


def test_abcd_normalize_fills_and_validates():
    A2, B2, C2, D2 = L.abcd_normalize(A=[[0.0, 1.0], [-1.0, -0.5]], B=[[0.0], [1.0]],
                                      C=[[1.0, 0.0]])
    assert D2.shape == (1, 1) and np.all(D2 == 0)
    with pytest.raises(ValueError):
        L.abcd_normalize(A=np.eye(2), B=np.ones((3, 1)), C=np.ones((1, 2)), D=0)


# ── discretization ───────────────────────────────────────────────────────────


@pytest.mark.parametrize("method", ["zoh", "foh", "bilinear", "euler",
                                    "backward_diff", "impulse"])
def test_cont2discrete_matches_scipy(method):
    o = L.cont2discrete(SYS_SS, 0.1, method=method)
    r = ss.cont2discrete(SYS_SS, 0.1, method=method)
    for i in range(4):
        np.testing.assert_allclose(o[i], r[i], atol=1e-12)


def test_cont2discrete_gbt_and_tf_zpk_forms():
    o = L.cont2discrete(SYS_SS, 0.1, method="gbt", alpha=0.3)
    r = ss.cont2discrete(SYS_SS, 0.1, method="gbt", alpha=0.3)
    for i in range(4):
        np.testing.assert_allclose(o[i], r[i], atol=1e-13)
    o = L.cont2discrete(([1.0], [1.0, 1.0]), 0.05)
    r = ss.cont2discrete(([1.0], [1.0, 1.0]), 0.05)
    np.testing.assert_allclose(o[0], r[0], atol=1e-14)
    np.testing.assert_allclose(o[1], r[1], atol=1e-14)
    o = L.cont2discrete(ss.butter(2, 1.0, analog=True, output="zpk"), 0.05)
    r = ss.cont2discrete(ss.butter(2, 1.0, analog=True, output="zpk"), 0.05)
    np.testing.assert_allclose(np.sort_complex(o[1]), np.sort_complex(r[1]), atol=1e-12)


# ── continuous simulation ────────────────────────────────────────────────────


def test_lsim_matches_scipy_both_interp_modes():
    u = np.sin(2 * T)
    for interp in (True, False):
        t1, y1, x1 = L.lsim(SYS_TF, u, T, interp=interp)
        t2, y2, x2 = ss.lsim(SYS_TF, u, T, interp=interp)
        np.testing.assert_allclose(y1, y2, atol=1e-12)
        np.testing.assert_allclose(x1, x2, atol=1e-12)


def test_impulse_step_match_scipy():
    for ours, ref in [(L.impulse, ss.impulse), (L.step, ss.step)]:
        t1, y1 = ours(SYS_TF, T=T)
        t2, y2 = ref(SYS_TF, T=T)
        np.testing.assert_allclose(y1, y2, atol=1e-12)
        t1, y1 = ours(SYS_TF)  # default heuristic grid
        t2, y2 = ref(SYS_TF)
        np.testing.assert_allclose(t1, t2, atol=1e-12)
        np.testing.assert_allclose(y1, y2, atol=1e-12)


def test_freqresp_bode_match_scipy():
    w = np.logspace(-1, 2, 64)
    np.testing.assert_allclose(L.freqresp(SYS_TF, w=w)[1], ss.freqresp(SYS_TF, w=w)[1],
                               atol=1e-12)
    w1, m1, p1 = L.bode(SYS_TF, w=w)
    w2, m2, p2 = ss.bode(SYS_TF, w=w)
    np.testing.assert_allclose(m1, m2, atol=1e-11)
    np.testing.assert_allclose(p1, p2, atol=1e-11)


# ── discrete simulation ──────────────────────────────────────────────────────


def test_dlsim_matches_scipy_tf_and_ss():
    u = RNG.standard_normal(50)
    t1, y1 = L.dlsim(DSYS, u)
    t2, y2 = ss.dlsim(DSYS, u)
    np.testing.assert_allclose(t1, t2)
    np.testing.assert_allclose(y1, y2, atol=1e-13)
    Ad = np.array([[0.9, 0.1], [0.0, 0.8]])
    Bd = np.array([[0.0], [1.0]])
    Cd = np.array([[1.0, 0.0]])
    Dd = np.array([[0.0]])
    t1, y1, x1 = L.dlsim((Ad, Bd, Cd, Dd, 0.2), u)
    t2, y2, x2 = ss.dlsim((Ad, Bd, Cd, Dd, 0.2), u)
    np.testing.assert_allclose(y1, y2, atol=1e-13)
    np.testing.assert_allclose(x1, x2, atol=1e-13)


def test_dimpulse_dstep_dfreqresp_dbode_match_scipy():
    t1, y1 = L.dimpulse(DSYS, n=40)
    t2, y2 = ss.dimpulse(DSYS, n=40)
    np.testing.assert_allclose(y1[0], y2[0], atol=1e-13)
    t1, y1 = L.dstep(DSYS, n=40)
    t2, y2 = ss.dstep(DSYS, n=40)
    np.testing.assert_allclose(y1[0], y2[0], atol=1e-13)
    w1, h1 = L.dfreqresp(DSYS, n=128)
    w2, h2 = ss.dfreqresp(DSYS, n=128)
    np.testing.assert_allclose(w1, w2, atol=1e-13)
    np.testing.assert_allclose(h1, h2, atol=1e-12)
    w1, m1, _ = L.dbode(DSYS, n=64)
    w2, m2, _ = ss.dbode(DSYS, n=64)
    np.testing.assert_allclose(m1, m2, atol=1e-11)


def test_dlsim_rides_block_state_engine():
    # The device path for discrete tf systems is lfilter: same recurrence.
    from gpu_fft_tpu.ops.iir import lfilter

    u = RNG.standard_normal(128).astype(np.float64)
    _, y = L.dlsim(DSYS, u)
    y_dev = lfilter(DSYS[0], DSYS[1], u)
    np.testing.assert_allclose(np.squeeze(y), y_dev, atol=1e-4)


# ── pole placement ───────────────────────────────────────────────────────────


def test_place_poles_achieves_requested_spectrum():
    A = RNG.standard_normal((4, 4))
    B = RNG.standard_normal((4, 2))
    desired = np.array([-1.0, -2.0, -1.5 + 1j, -1.5 - 1j])
    fsf = L.place_poles(A, B, desired)
    achieved = np.sort_complex(np.linalg.eigvals(A - B @ fsf.gain_matrix))
    np.testing.assert_allclose(achieved, np.sort_complex(desired), atol=1e-6)
    assert fsf.gain_matrix.shape == (2, 4)
    assert np.isrealobj(fsf.gain_matrix)


def test_place_poles_rejects_uncontrollable():
    A = np.diag([1.0, 2.0])
    B = np.array([[1.0], [0.0]])  # second mode unreachable
    with pytest.raises(ValueError, match="controllable"):
        L.place_poles(A, B, [-1.0, -2.0])


# ── partial fractions ────────────────────────────────────────────────────────


def _match_pairs(p1, r1, p2, r2, tol):
    o = sorted(zip(p1, r1), key=lambda q: (q[0].real, q[0].imag, abs(q[1])))
    r = sorted(zip(p2, r2), key=lambda q: (q[0].real, q[0].imag, abs(q[1])))
    np.testing.assert_allclose([q[0] for q in o], [q[0] for q in r], atol=tol)
    np.testing.assert_allclose([q[1] for q in o], [q[1] for q in r], atol=tol)


@pytest.mark.parametrize("b,a", [
    ([1.0, 5.0, 6.0], [1.0, 6.0, 11.0, 6.0]),            # distinct real poles
    ([1.0, 2.0, 3.0, 4.0], [1.0, 3.0, 2.0]),             # improper (direct term)
    ([1.0], [1.0, 0.0, 1.0]),                            # complex pole pair
])
def test_residue_matches_scipy(b, a):
    r1, p1, k1 = L.residue(b, a)
    r2, p2, k2 = ss.residue(b, a)
    _match_pairs(p1, r1, p2, r2, 1e-7)
    np.testing.assert_allclose(np.atleast_1d(k1), np.atleast_1d(k2), atol=1e-10)
    b2, a2 = L.invres(r1, p1, k1)
    np.testing.assert_allclose(np.real(np.atleast_1d(b2))[-len(b):], b, atol=1e-7)
    np.testing.assert_allclose(np.real(a2), a, atol=1e-7)


def test_residue_repeated_pole():
    b = [1.0, 2.0]
    a = np.convolve([1.0, 1.0], np.convolve([1.0, 1.0], [1.0, 2.0]))  # (s+1)² (s+2)
    r1, p1, k1 = L.residue(b, a)
    r2, p2, k2 = ss.residue(b, a)
    _match_pairs(np.round(p1, 8), r1, np.round(p2, 8), r2, 1e-6)
    b2, a2 = L.invres(r1, p1, k1)
    np.testing.assert_allclose(np.real(a2), np.asarray(a, float), atol=1e-7)


@pytest.mark.parametrize("b,a", [
    ([1.0, -0.5], [1.0, -1.1, 0.3]),
    ([1.0, 0.2, -0.3, 0.1], [1.0, -0.9, 0.2]),           # direct terms
])
def test_residuez_matches_scipy(b, a):
    r1, p1, k1 = L.residuez(b, a)
    r2, p2, k2 = ss.residuez(b, a)
    _match_pairs(p1, r1, p2, r2, 1e-8)
    np.testing.assert_allclose(np.atleast_1d(k1) if np.size(k1) else [],
                               np.atleast_1d(k2) if np.size(k2) else [], atol=1e-10)
    b2, a2 = L.invresz(r1, p1, k1)
    np.testing.assert_allclose(np.real(b2), np.asarray(b, float), atol=1e-8)
    np.testing.assert_allclose(np.real(a2), np.asarray(a, float), atol=1e-8)


def test_residuez_repeated_pole_roundtrip():
    a = np.convolve([1.0, -0.5], [1.0, -0.5])
    b = [1.0, 0.3]
    r1, p1, k1 = L.residuez(b, a)
    r2, p2, k2 = ss.residuez(b, a)
    _match_pairs(np.round(p1, 8), r1, np.round(p2, 8), r2, 1e-8)
    b2, _ = L.invresz(r1, p1, k1)
    np.testing.assert_allclose(np.real(np.atleast_1d(b2))[:2], b, atol=1e-8)


def test_unique_roots_matches_scipy():
    p = [1.0, 1.0001, 2.0, 2.0, 3.0]
    u1, m1 = L.unique_roots(p, tol=1e-3)
    u2, m2 = ss.unique_roots(p, tol=1e-3)
    np.testing.assert_array_equal(np.sort(m1), np.sort(m2))
    assert u1.size == u2.size


# ── classes ──────────────────────────────────────────────────────────────────


def test_lti_classes_mirror_scipy():
    sys_c = L.lti([1.0], [1.0, 1.0])
    ref = ss.lti([1.0], [1.0, 1.0])
    t1, y1 = sys_c.step(T=T)
    t2, y2 = ref.step(T=T)
    np.testing.assert_allclose(y1, y2, atol=1e-12)
    d = sys_c.to_discrete(0.1)
    rd = ref.to_discrete(0.1)
    np.testing.assert_allclose(np.squeeze(d.num), np.squeeze(rd.num), atol=1e-13)
    np.testing.assert_allclose(d.den, rd.den, atol=1e-13)
    assert d.dt == 0.1
    # representation conversions close the triangle
    zpk = sys_c.to_zpk()
    back = zpk.to_ss().to_tf()
    np.testing.assert_allclose(back.num, sys_c.num, atol=1e-10)
    np.testing.assert_allclose(back.den, sys_c.den, atol=1e-10)


def test_dlti_responses_match_scipy():
    dsc = L.dlti([1.0, 0.1], [1.0, -0.8], dt=0.1)
    ref = ss.dlti([1.0, 0.1], [1.0, -0.8], dt=0.1)
    t1, y1 = dsc.impulse(N=30)
    t2, y2 = ref.impulse(n=30)
    np.testing.assert_allclose(y1[0], y2[0], atol=1e-13)
    w1, h1 = dsc.freqresp(n=64)
    w2, h2 = ref.freqresp(n=64)
    np.testing.assert_allclose(h1, h2, atol=1e-12)


def test_factories_dispatch_by_arity():
    assert isinstance(L.lti([1.0], [1.0, 1.0]), L.TransferFunction)
    assert isinstance(L.lti([], [-1.0], 2.0), L.ZerosPolesGain)
    assert isinstance(L.lti(*SYS_SS), L.StateSpace)
    assert L.dlti([1.0], [1.0, -0.5]).dt is True
    with pytest.raises(ValueError):
        L.lti([1.0])


def test_lti_reachable_from_namespaces():
    import gpu_fft_tpu
    import gpu_fft_tpu.signal as sig

    for mod in (gpu_fft_tpu, sig):
        for name in ("lti", "dlti", "TransferFunction", "ZerosPolesGain", "StateSpace",
                     "lsim", "impulse", "step", "bode", "freqresp",
                     "dlsim", "dimpulse", "dstep", "dbode", "dfreqresp",
                     "cont2discrete", "tf2ss", "ss2tf", "zpk2ss", "ss2zpk",
                     "abcd_normalize", "place_poles", "residue", "residuez",
                     "invres", "invresz", "unique_roots"):
            assert getattr(mod, name, None) is not None, name
