"""Kernel-path selection coverage.

The reference selects kernel paths by N (inner-only <=1024, trailing radix-2
at 2048, pure radix-4 at 4096 — ``tests/fft.rs:112-118``).  The analog here:
direct (N <= 512), fused four-step (<= 65536, folded or transpose layout by
batch), staged large-N above (Pallas stage A + folded-einsum stage B at
every production size; the recursive stage-B fallback exists only for
forced non-plannable n2 and is covered separately).  Each boundary gets
oracle coverage on both sides.
"""

import numpy as np
import pytest

import gpu_fft_tpu as gf
from gpu_fft_tpu.config import DIRECT_MAX, FUSED_MAX


def _oracle_check(n, rng, tol_scale=1.0):
    x = rng.uniform(-1.0, 1.0, n).astype(np.float32)
    re, im = gf.fft(x)
    ref = np.fft.fft(x.astype(np.float64))
    scale = max(1.0, float(np.abs(ref).max()))
    assert np.abs(re - ref.real).max() / scale < 1e-5 * tol_scale, f"n={n} real"
    assert np.abs(im - ref.imag).max() / scale < 1e-5 * tol_scale, f"n={n} imag"


@pytest.mark.parametrize(
    "n",
    [
        DIRECT_MAX,          # last direct size
        DIRECT_MAX * 2,      # first fourstep size
        FUSED_MAX,           # last fused size
        2 * FUSED_MAX,       # first staged size (n2=1024)
        4 * FUSED_MAX,       # n2=2048
        8 * FUSED_MAX,       # n2=4096
    ],
)
def test_boundary_sizes_vs_oracle(rng, n):
    _oracle_check(n, rng)


def test_recursive_stage_b_fallback(rng, monkeypatch):
    # The recursive stage-B path (rows via transform_any + explicit digit-
    # reversal transpose) only triggers when the plan is not stage-B
    # plannable — impossible for production sizes, so force it.
    import gpu_fft_tpu.plan as plan_mod
    from gpu_fft_tpu.kernels.large import transform_any
    import jax.numpy as jnp

    monkeypatch.setattr(plan_mod, "stage_b_plannable", lambda n2: False)
    plan_mod.get_stage_a_plan.cache_clear()
    try:
        n = 2 * FUSED_MAX
        x = rng.uniform(-1.0, 1.0, (1, n)).astype(np.float32)
        assert plan_mod.get_stage_a_plan(n, -1)["stage_b"] is None
        yr, yi = transform_any(jnp.asarray(x), None, n, -1)
        ref = np.fft.fft(x[0].astype(np.float64))
        scale = np.abs(ref).max()
        assert np.abs(np.asarray(yr[0]) - ref.real).max() / scale < 1e-5
        assert np.abs(np.asarray(yi[0]) - ref.imag).max() / scale < 1e-5
    finally:
        plan_mod.get_stage_a_plan.cache_clear()


def test_real_matches_complex_path(rng):
    # The real-input fast path (2-matmul first stage) must agree with the
    # generic complex transform: run the same signal as real input and as
    # explicit zero-imag complex input.
    from gpu_fft_tpu.kernels.large import transform_any
    import jax.numpy as jnp

    for n in (4096, 2 * FUSED_MAX):
        x = rng.uniform(-1.0, 1.0, (2, n)).astype(np.float32)
        xj = jnp.asarray(x)
        rr, ri = transform_any(xj, None, n, -1)  # real fast path
        cr, ci = transform_any(xj, jnp.zeros_like(xj), n, -1)  # complex path
        scale = max(1.0, float(np.abs(np.asarray(cr)).max()))
        assert np.abs(np.asarray(rr) - np.asarray(cr)).max() / scale < 1e-5, f"n={n} real"
        assert np.abs(np.asarray(ri) - np.asarray(ci)).max() / scale < 1e-5, f"n={n} imag"


def test_inverse_boundaries(rng):
    for n in (DIRECT_MAX, DIRECT_MAX * 2, FUSED_MAX, 2 * FUSED_MAX):
        re = rng.uniform(-1.0, 1.0, n).astype(np.float32)
        im = rng.uniform(-1.0, 1.0, n).astype(np.float32)
        out = gf.ifft(re, im)
        ref = np.fft.ifft(re.astype(np.float64) + 1j * im.astype(np.float64))
        assert np.abs(out[:n] - ref.real).max() < 1e-4, f"ifft n={n}"


# ── Real-input packed forward path (round 3, docs/ABLATION.md §11) ───────────


@pytest.mark.parametrize("n", [256, 4096, 65536, 1 << 17])
def test_packed_real_path_matches_oracle(rng, n):
    # The packing identity must hold at every size class it can dispatch to
    # (fused and staged half-transforms), independent of the tuning gate.
    import jax.numpy as jnp

    from gpu_fft_tpu.kernels.large import _real_packed_fft

    x = rng.uniform(-1.0, 1.0, (3, n)).astype(np.float32)
    yr, yi = _real_packed_fft(jnp.asarray(x), n, None)
    ref = np.fft.fft(x.astype(np.float64), axis=-1)
    scale = float(np.abs(ref).max())
    assert np.abs(np.asarray(yr) - ref.real).max() / scale < 2e-6
    assert np.abs(np.asarray(yi) - ref.imag).max() / scale < 2e-6


def test_packed_real_path_scale_folding(rng):
    import jax.numpy as jnp

    from gpu_fft_tpu.kernels.large import _real_packed_fft

    n = 4096
    x = rng.uniform(-1.0, 1.0, (2, n)).astype(np.float32)
    yr, yi = _real_packed_fft(jnp.asarray(x), n, 1.0 / n)
    ref = np.fft.fft(x.astype(np.float64), axis=-1) / n
    scale = float(np.abs(ref).max())
    assert np.abs(np.asarray(yr) - ref.real).max() / scale < 2e-6


def test_packed_gate_still_meets_roundtrip_gate(rng, monkeypatch):
    # Force the packing gate on and check the reference 5*log2(N)*eps
    # roundtrip bound end-to-end through the public API.
    from gpu_fft_tpu.kernels import large

    monkeypatch.setattr(large, "rfft_pack_applies", lambda b, n: n >= 256)
    n = 65536
    x = rng.uniform(-1.0, 1.0, n).astype(np.float32)
    re, im = gf.fft(x)
    out = gf.ifft(re, im)
    bound = 5 * np.log2(n) * np.finfo(np.float32).eps
    assert np.abs(out[:n] - x).max() <= bound


def test_deinterleave_matrix_is_permutation():
    from gpu_fft_tpu.plan import deinterleave_matrix

    p = deinterleave_matrix()
    assert p.sum() == 256 and (p.sum(0) == 1).all() and (p.sum(1) == 1).all()
    v = np.arange(256, dtype=np.float32)
    out = v @ p
    assert (out[:128] == v[0::2]).all() and (out[128:] == v[1::2]).all()
