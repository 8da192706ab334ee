"""Whole-transform single-kernel path (kernels/fused.py:whole_transform).

The TPU translation of the reference's single-dispatch fused butterfly for
N <= TILE (reference ``src/butterfly.rs:84-147``): the entire four-step in
ONE pallas_call, natural-order output falling out of the (n2, n1) block
layout.  Oracle: numpy f64 FFT (the parity-suite pattern, reference
``tests/parity.rs``).  On the CPU mesh the kernel runs in interpret mode;
bench.py's Mosaic smoke covers it on hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpu_fft_tpu import tuning
from gpu_fft_tpu.kernels.fused import whole_transform
from gpu_fft_tpu.kernels.large import transform_any
from gpu_fft_tpu.plan import get_whole_plan, whole_kernel_applies

rng = np.random.default_rng(11)


@pytest.mark.parametrize("n", [1024, 4096, 16384])
@pytest.mark.parametrize("b", [1, 3])
def test_whole_real_forward_matches_numpy(n, b):
    x = rng.standard_normal((b, n)).astype(np.float32)
    yr, yi = whole_transform(jnp.asarray(x), None, get_whole_plan(n, -1))
    ref = np.fft.fft(x.astype(np.float64))
    scale = np.abs(ref).max()
    assert np.abs(np.asarray(yr) - ref.real).max() / scale < 1e-6
    assert np.abs(np.asarray(yi) - ref.imag).max() / scale < 1e-6


@pytest.mark.parametrize("n", [1024, 8192])
def test_whole_complex_inverse_scale_folded(n):
    xr = rng.standard_normal((2, n)).astype(np.float32)
    xi = rng.standard_normal((2, n)).astype(np.float32)
    p = get_whole_plan(n, +1, scale=1.0 / n)
    zr, zi = whole_transform(jnp.asarray(xr), jnp.asarray(xi), p)
    ref = np.fft.ifft(xr.astype(np.float64) + 1j * xi.astype(np.float64))
    assert np.abs(np.asarray(zr) - ref.real).max() < 1e-6
    assert np.abs(np.asarray(zi) - ref.imag).max() < 1e-6


def test_whole_plan_validation():
    with pytest.raises(ValueError):
        get_whole_plan(1000, -1)  # not a multiple of 128
    with pytest.raises(ValueError):
        get_whole_plan(512, -1)  # below the band
    with pytest.raises(ValueError):
        get_whole_plan(1 << 20, -1)  # above FUSED_MAX


def _open_gate(monkeypatch, n_min=1024, n_max=16384, b_max=4):
    """Force the whole-kernel dispatch gate open (it ships measured-closed
    until the hardware table says otherwise)."""
    from dataclasses import replace

    t = replace(
        tuning.get_tuning(),
        whole_n_min=n_min,
        whole_n_max=n_max,
        whole_batch_max=b_max,
    )
    import gpu_fft_tpu.plan as plan_mod

    monkeypatch.setattr(plan_mod, "get_tuning", lambda: t)


def test_gate_respects_tuning_table(monkeypatch):
    assert not whole_kernel_applies(1, 4096) or tuning.get_tuning().whole_n_min <= 4096
    _open_gate(monkeypatch)
    assert whole_kernel_applies(1, 4096)
    assert whole_kernel_applies(4, 1024)
    assert not whole_kernel_applies(5, 1024)  # batch above gate
    assert not whole_kernel_applies(1, 32768)  # size above gate
    assert not whole_kernel_applies(1, 512)  # below the hard floor


def test_dispatch_through_transform_any(monkeypatch):
    _open_gate(monkeypatch)
    x = rng.standard_normal((1, 4096)).astype(np.float32)
    yr, yi = transform_any(jnp.asarray(x), None, 4096, -1)
    ref = np.fft.fft(x.astype(np.float64))
    scale = np.abs(ref).max()
    assert np.abs(np.asarray(yr) - ref.real).max() / scale < 1e-6
    assert np.abs(np.asarray(yi) - ref.imag).max() / scale < 1e-6


def test_autodiff_through_whole_kernel(monkeypatch):
    """grad/jvp/vjp ride the linear_call seam (F^T = F transpose)."""
    _open_gate(monkeypatch)
    n = 1024
    x = jnp.asarray(rng.standard_normal((1, n)).astype(np.float32))

    def power(v):
        yr, yi = transform_any(v, None, n, -1)
        return jnp.sum(yr**2 + yi**2)

    # Parseval: sum|X|^2 = n * sum x^2  =>  grad = 2*n*x.
    g = np.asarray(jax.grad(power)(x))
    expect = 2.0 * n * np.asarray(x)
    assert np.abs(g - expect).max() / np.abs(expect).max() < 1e-5

    # vjp/jvp dot test on the complex path: <L v, w> == <v, L^T w>.
    v = (x, 0.5 * x)
    w_r = jnp.asarray(rng.standard_normal((1, n)).astype(np.float32))
    w_i = jnp.asarray(rng.standard_normal((1, n)).astype(np.float32))

    def f(xr, xi):
        return transform_any(xr, xi, n, +1)

    out, vjp = jax.vjp(f, *v)
    back = vjp((w_r, w_i))
    _, tangent = jax.jvp(f, v, v)
    lhs = float(jnp.vdot(tangent[0], w_r) + jnp.vdot(tangent[1], w_i))
    rhs = float(jnp.vdot(v[0], back[0]) + jnp.vdot(v[1], back[1]))
    assert abs(lhs - rhs) / max(abs(lhs), 1.0) < 1e-4


# ── Packed single-operand variant (round 5, docs/ABLATION.md §24) ────────────


@pytest.mark.parametrize("n", [1024, 4096, 16384])
@pytest.mark.parametrize("b", [1, 3])
def test_packed_real_forward_matches_numpy(n, b):
    from gpu_fft_tpu.kernels.fused import whole_transform_packed
    from gpu_fft_tpu.plan import get_whole_packed_plan

    x = rng.standard_normal((b, n)).astype(np.float32)
    yr, yi = whole_transform_packed(jnp.asarray(x), None, get_whole_packed_plan(n, -1))
    ref = np.fft.fft(x.astype(np.float64))
    scale = np.abs(ref).max()
    assert np.abs(np.asarray(yr) - ref.real).max() / scale < 1e-6
    assert np.abs(np.asarray(yi) - ref.imag).max() / scale < 1e-6


@pytest.mark.parametrize("n", [1024, 8192])
def test_packed_complex_inverse_scale_folded(n):
    from gpu_fft_tpu.kernels.fused import whole_transform_packed
    from gpu_fft_tpu.plan import get_whole_packed_plan

    xr = rng.standard_normal((2, n)).astype(np.float32)
    xi = rng.standard_normal((2, n)).astype(np.float32)
    p = get_whole_packed_plan(n, +1, scale=1.0 / n)
    zr, zi = whole_transform_packed(jnp.asarray(xr), jnp.asarray(xi), p)
    ref = np.fft.ifft(xr.astype(np.float64) + 1j * xi.astype(np.float64))
    assert np.abs(np.asarray(zr) - ref.real).max() < 1e-6
    assert np.abs(np.asarray(zi) - ref.imag).max() < 1e-6


def test_packed_vs_whole_parity():
    from gpu_fft_tpu.kernels.fused import whole_transform_packed
    from gpu_fft_tpu.plan import get_whole_packed_plan

    n = 2048
    xr = jnp.asarray(rng.standard_normal((2, n)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((2, n)).astype(np.float32))
    a = whole_transform(xr, xi, get_whole_plan(n, -1))
    b = whole_transform_packed(xr, xi, get_whole_packed_plan(n, -1))
    for u, v in zip(a, b):
        assert np.abs(np.asarray(u) - np.asarray(v)).max() / np.abs(np.asarray(u)).max() < 1e-6


def test_packed_dispatch_and_autodiff(monkeypatch):
    """transform_any routes n <= whole_packed_n_max through the packed
    kernel (the sub-gate) and AD rides the same linear_call seam."""
    _open_gate(monkeypatch)
    n = 1024
    assert n <= tuning.get_tuning().whole_packed_n_max
    x = jnp.asarray(rng.standard_normal((1, n)).astype(np.float32))

    def power(v):
        yr, yi = transform_any(v, None, n, -1)
        return jnp.sum(yr**2 + yi**2)

    g = np.asarray(jax.grad(power)(x))
    expect = 2.0 * n * np.asarray(x)
    assert np.abs(g - expect).max() / np.abs(expect).max() < 1e-5
