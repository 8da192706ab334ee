"""Real-output inverse: Hermitian input FOLD vs the full complex inverse.

The dual of the forward half-spectrum path (scripts/ablate_half_spectrum.py):
every real-output consumer (irfft, oaconvolve, fftfilt, FIRStream, istft,
irfft2, fft_convolve) currently reconstructs/keeps the FULL Hermitian
spectrum, runs the full complex inverse, and throws the imaginary half
away.  Folding the conjugate half BEFORE the matmuls instead
(kernels/fused_jnp.py:fused_irfft_jnp):

  * stage 1 reads and contracts only h1 = n1/2 + 1 grid columns (half the
    input bytes, half the first matmul);
  * the twiddle acts on half the intermediate;
  * stage 2 needs only the REAL part: 2 real einsums (vs 3-4) over a full
    n1/2 = 128-tile contraction, natural output order (zero transposes),
    plus a rank-1 Nyquist broadcast.

~2.7x FLOP cut on paper vs the shipped full inverse.  This script measures
the shipped `transform_any(..., +1, scale=1/n)` (discarding imag, exactly
what consumers do) against `fused_irfft_jnp` on identical Hermitian
spectra, plus accuracy vs numpy f64 irfft.

Run on TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/ablate_irfft_half.py
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from gpu_fft_tpu.config import enable_compilation_cache
    from gpu_fft_tpu.kernels.fused_jnp import fused_irfft_jnp
    from gpu_fft_tpu.kernels.large import transform_any
    from gpu_fft_tpu.plan import get_irfft_plan
    from gpu_fft_tpu.utils.profiling import chained_step_stats

    enable_compilation_cache()
    rng = np.random.default_rng(0)

    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "staged":
        # The staged-size fold (stage_b_irfft_jnp): inverse_real dispatches
        # to stage A + per-row fold at these sizes.
        configs = [
            (1, 1 << 17), (4, 1 << 17),
            (1, 1 << 18),
            (1, 1 << 20), (4, 1 << 20),
            (1, 1 << 22),
        ]
    else:
        configs = [
            (1, 4096), (16, 4096), (64, 4096),
            (1, 16384), (4, 16384), (33, 16384),  # 33 = oaconvolve's block count
            (1, 65536), (2, 65536), (16, 65536),
        ]
    for b, n in configs:
        x = rng.standard_normal((b, n)).astype(np.float32)
        X = np.fft.fft(x.astype(np.float64), axis=-1)
        xr = jnp.asarray(X.real.astype(np.float32))
        xi = jnp.asarray(X.imag.astype(np.float32))

        if n <= 65536:
            plan = get_irfft_plan(n, scale=1.0 / n)

            def half(zr, zi, plan=plan):
                return fused_irfft_jnp(zr, zi, plan)
        else:
            from gpu_fft_tpu.kernels.large import inverse_real

            def half(zr, zi, n=n):
                return inverse_real(zr, zi, n, scale=1.0 / n)

        def ship(zr, zi, n=n):
            yr, _ = transform_any(zr, zi, n, +1, scale=1.0 / n)
            return yr

        out = np.asarray(jax.jit(half)(xr, xi))
        bound = 5 * np.log2(n) * np.finfo(np.float32).eps
        err = np.abs(out - x).max() / np.abs(x).max()

        z0 = jnp.stack([xr, xi])  # (2, b, n): chained_step_stats wants ONE array

        def mk(fn):
            def step(z):
                y = fn(z[0], z[1])
                return z * jnp.float32(0.5) + y[None] * jnp.float32(1e-3)
            return step

        sh = chained_step_stats(mk(half), z0, k1=5, k2=105, reps=5)
        ss = chained_step_stats(mk(ship), z0, k1=5, k2=105, reps=5)
        print(
            f"B={b:3d} n=2^{int(np.log2(n)):2d}: "
            f"fold {sh.median_s*1e6:8.2f} us (iqr {sh.iqr_s*1e6:5.2f})  "
            f"shipped {ss.median_s*1e6:8.2f} us (iqr {ss.iqr_s*1e6:5.2f})  "
            f"ratio {ss.median_s/sh.median_s:5.2f}x  err={err:.2e} "
            f"({'OK' if err < bound else 'FAIL'} vs {bound:.1e})",
            flush=True,
        )


if __name__ == "__main__":
    main()
