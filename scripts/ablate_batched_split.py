"""Ablation: four-step split (n1, n2) for BATCHED fused transforms.

The b64/n4096 family sits at ~36-49% of speed-of-light while b16/n16384
reaches 95%, so the question is whether a different factorization recovers
the gap.  Candidates: every pow2 split of n (n1 from 8 to n/8), forward
real and inverse complex, at the weak configs.  Measured interleaved
(candidate order re-randomized per round) with chained device timing, so
drift cannot masquerade as a winner.

Usage: python scripts/ablate_batched_split.py [--rounds 3]
"""

from __future__ import annotations

import argparse
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

CONFIGS = [  # (b, n, real_input)
    (64, 4096, True),
    (64, 4096, False),
    (16, 65536, True),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    import jax.numpy as jnp

    from gpu_fft_tpu.config import enable_compilation_cache
    from gpu_fft_tpu.kernels.fused_jnp import fused_fft_jnp_folded
    from gpu_fft_tpu.kernels.tables import dft_matrix_ext, twiddle_table
    from gpu_fft_tpu.plan import FusedPlan, fused_split
    from gpu_fft_tpu.utils.profiling import chained_step_stats

    enable_compilation_cache()
    rng = np.random.default_rng(0)

    def custom_plan(n: int, n1: int, sign: int) -> FusedPlan:
        n2 = n // n1
        f1r, f1i, f1s, f1d = dft_matrix_ext(n1, sign)
        f2r, f2i, f2s, f2d = dft_matrix_ext(n2, sign)
        twr, twi = twiddle_table(n2, n1, n, sign)
        tables = {
            "f1r": f1r, "f1i": f1i, "f1s": f1s, "f1d": f1d,
            "f2r": f2r, "f2i": f2i, "f2s": f2s, "f2d": f2d,
            "twr": twr, "twi": twi,
        }
        return FusedPlan(n=n, sign=sign, kind="fourstep", n1=n1, n2=n2, tables=tables)

    for b, n, real in CONFIGS:
        m = n.bit_length() - 1
        splits = [1 << k for k in range(3, m - 2)]
        current = fused_split(n, b)
        x = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
        s = np.float32(1.0 / np.sqrt(n))

        def make_step(plan):
            if real:
                def step(xx):
                    yr, _ = fused_fft_jnp_folded(xx, None, plan)
                    return yr * s
            else:
                def step(xx):
                    yr, _ = fused_fft_jnp_folded(xx, xx * np.float32(0.5), plan)
                    return yr * s
            return step

        plans = {n1: custom_plan(n, n1, -1) for n1 in splits}
        results: dict[int, list[float]] = {n1: [] for n1 in splits}
        for r in range(args.rounds):
            order = list(splits)
            rng.shuffle(order)
            for n1 in order:
                st = chained_step_stats(make_step(plans[n1]), x, reps=3)
                results[n1].append(st.median_s)
        kind = "real fwd" if real else "complex inv-form"
        print(f"\n(b={b}, n={n}) {kind} — current split {current}:")
        best = None
        for n1 in splits:
            med = float(np.median(results[n1])) * 1e6
            mark = " <- current" if (n1, n // n1) == current else ""
            print(f"  n1={n1:4d} n2={n // n1:5d}: {med:8.2f} us{mark}", flush=True)
            if best is None or med < best[1]:
                best = (n1, med)
        print(f"  best: n1={best[0]} at {best[1]:.2f} us")


if __name__ == "__main__":
    main()
