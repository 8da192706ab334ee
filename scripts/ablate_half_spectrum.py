"""Half-spectrum real-input transforms: compute k1 <= n1/2, mirror the rest.

A real-input transform's spectrum is Hermitian: X[n-k] = conj(X[k]).  In
both the staged pipeline and the fused transpose form, the k1 digit rides
the post-twiddle stages as a non-contracted axis, so slicing k1 to
[0, n1/2] halves the second matmul stage's FLOPs and traffic — unlike the
packed-rfft trick (docs/ABLATION.md §11, rejected: pathological
relayouts), nothing is reindexed on the lane axis until one cheap mirror
epilogue (axis-reversals of digit axes + conjugate + concat) at the end.

Mirror math: with k = k1 + n1*j (j = flat inner output digit, n2 values),
n - k = (n1 - k1) + n1*(n2 - 1 - j) for k1 in [1, n1), and the flat-j
reversal n2-1-j is EXACTLY independent axis reversals of j's digit axes
(digits complement without carries) — see kernels/fused_jnp.py:
_hermitian_mirror.

This script measures the SHIPPED functions (stage_b_half_jnp,
fused_fft_jnp_half) against the shipped full-spectrum dispatch, plus the
accuracy of each half path vs numpy f64.  Variant history (measured v5e
2026-08, full table in docs/ABLATION.md §13):

  * stage-B 'bJjk' folded output order on the h-slice: the h-sized minor
    axis pads back to a full 128-lane tile — halving forfeited; rejected.
  * NATIVE 'bkjJ' output order + mirror on the major k1 axis + ONE
    explicit half-array transpose: 75-77 us at 2^20 B=1 vs 90-101 shipped
    full-spectrum; KEPT (stage_b_half_jnp).
  * lanes-major stage-B orientation (k1 on lanes throughout): lost, see
    scripts/ablate_lanes_major.py.

Run on TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/ablate_half_spectrum.py
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from gpu_fft_tpu.config import enable_compilation_cache
    from gpu_fft_tpu.kernels.fused import stage_a
    from gpu_fft_tpu.kernels.fused_jnp import fused_fft_jnp_half, stage_b_half_jnp
    from gpu_fft_tpu.kernels.large import transform_any
    from gpu_fft_tpu.plan import get_fused_plan, get_stage_a_plan
    from gpu_fft_tpu.utils.profiling import chained_step_stats

    enable_compilation_cache()
    rng = np.random.default_rng(0)

    def mk(fn):
        def step(z):
            a, b = fn(z)
            return a * jnp.float32(1e-3) + b * jnp.float32(1e-3) + z * jnp.float32(0.5)
        return step

    def report(tag, b, n, half_fn, x_np):
        x = jnp.asarray(x_np)

        @jax.jit
        def ship(z, n=n):
            return transform_any(z, None, n, -1)

        rr, ri = jax.jit(half_fn)(x)
        ref = np.fft.fft(x_np[0].astype(np.float64))
        nrm = np.abs(ref).max()
        err = max(np.abs(np.asarray(rr[0], np.float64) - ref.real).max(),
                  np.abs(np.asarray(ri[0], np.float64) - ref.imag).max()) / nrm
        bound = 5 * np.log2(n) * np.finfo(np.float32).eps
        sh = chained_step_stats(mk(jax.jit(half_fn)), x, k1=5, k2=105, reps=5)
        ss = chained_step_stats(mk(ship), x, k1=5, k2=105, reps=5)
        print(f"{tag} B={b:3d} n=2^{int(np.log2(n)):2d}: "
              f"half {sh.median_s*1e6:8.2f} us (iqr {sh.iqr_s*1e6:5.2f})  "
              f"shipped {ss.median_s*1e6:8.2f} us (iqr {ss.iqr_s*1e6:5.2f})  "
              f"ratio {ss.median_s/sh.median_s:5.2f}x  err={err:.2e} "
              f"({'OK' if err < bound else 'FAIL'} vs {bound:.1e})",
              flush=True)

    # Staged sizes: Pallas stage A (real input) + half stage B.
    for b, n in [(1, 1 << 17), (1, 1 << 18), (1, 1 << 20), (1, 1 << 22), (4, 1 << 20)]:
        plan = get_stage_a_plan(n, -1)
        n1, n2, ct = plan["n1"], plan["n2"], plan["ct"]
        if plan["stage_b"] is None:
            continue

        def half(z, plan=plan, n1=n1, n2=n2, ct=ct):
            zr3 = z.reshape(z.shape[0], n1, n2)
            yr, yi = stage_a(zr3, None, n1, n2, plan, ct)
            return stage_b_half_jnp(yr, yi, n1, n2, plan["stage_b"])

        report("staged", b, n, half, rng.standard_normal((b, n)).astype(np.float32))

    # Fused sizes, transpose form (the B=1 big-n region where folded loses).
    for b, n in [(1, 16384), (1, 32768), (1, 65536), (2, 65536), (16, 65536)]:
        plan = get_fused_plan(n, -1, wide=False)

        def half(z, plan=plan):
            return fused_fft_jnp_half(z, plan)

        report("fused ", b, n, half, rng.standard_normal((b, n)).astype(np.float32))


if __name__ == "__main__":
    main()
