"""Mixed-radix split selection vs MXU lane padding — fft_exact_n48000 audit.

Round-4 ask 1: the shipped split picks the most BALANCED (n1, n2) by raw
FLOPs (ops/exact.py:mixed_split -> (200, 240) for 48,000), but on the MXU
both digits lane-pad to 256, so balance is the wrong objective.  In the
folded four-step ('bac,ak->bck' then 'bck,cJ->bJk') n1 is the LANE axis of
every stage's output AND stage 1's contraction; n2 is stage 2's
contraction and the sublane axis.  Padded-cost model (Karatsuba complex
dots: 2 stage-1 einsums for real input, 3 stage-2):

    cost ~ n2 * ceil128(n1) * (2 * ceilK(n1) + 3 * ceilK(n2))

which ranks (375, 128) [56.6M] < (250, 192) [62.9M] < (240, 200) [65.5M]
< (200, 240) [78.6M, shipped].  This script measures the candidates on the
real chip.
"""

from __future__ import annotations

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def plan_for(n: int, n1: int, n2: int, sign: int = -1):
    from gpu_fft_tpu.kernels.tables import dft_matrix_ext, twiddle_table
    from gpu_fft_tpu.plan import FusedPlan

    f1r, f1i, f1s, f1d = dft_matrix_ext(n1, sign)
    f2r, f2i, f2s, f2d = dft_matrix_ext(n2, sign)
    twr, twi = twiddle_table(n2, n1, n, sign)
    tables = {
        "f1r": f1r, "f1i": f1i, "f1s": f1s, "f1d": f1d,
        "f2r": f2r, "f2i": f2i, "f2s": f2s, "f2d": f2d,
        "twr": twr, "twi": twi,
    }
    return FusedPlan(n=n, sign=sign, kind="fourstep", n1=n1, n2=n2, tables=tables)


def main() -> None:
    import jax
    import jax.numpy as jnp  # noqa: F401

    from gpu_fft_tpu.kernels.fused_jnp import fused_fft_jnp_folded
    from gpu_fft_tpu.utils.profiling import chained_step_stats
    from gpu_fft_tpu.utils.roofline import compiled_stats

    n = 48000
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((1, n)).astype(np.float32))
    se = np.float32(1.0 / np.sqrt(n))
    ref = np.fft.fft(np.asarray(x0[0], dtype=np.float64))

    results = []
    for n1, n2 in ((200, 240), (240, 200), (250, 192), (375, 128), (128, 375), (300, 160)):
        p = plan_for(n, n1, n2)

        def step(x, p=p):
            yr, _ = fused_fft_jnp_folded(x, None, p)
            return yr * se

        y = np.asarray(jax.jit(step)(x0))[0] / se
        err = np.abs(y - ref.real).max() / np.abs(ref).max()
        s = chained_step_stats(step, x0, k1=20, k2=220, reps=4)
        try:
            nk = compiled_stats(step, x0)["n_kernels"]
        except Exception:
            nk = -1
        print(
            f"  ({n1:4d},{n2:4d}): {s.median_s * 1e6:7.2f} us (iqr {s.iqr_s * 1e6:.2f}),"
            f" {nk} kernels, rel err {err:.2e}",
            flush=True,
        )
        results.append((s.median_s, n1, n2))

    best = min(results)
    print(f"best: ({best[1]},{best[2]}) at {best[0] * 1e6:.2f} us")


if __name__ == "__main__":
    main()
