"""Fused-size follow-up: fold the digit reversal into the fused four-step.

The round-2 stage-B finding (digit reversal as the final einsum's output
permutation beats an explicit transpose) applied to the FUSED sizes:

  * ``current`` — fused_fft_jnp: swapaxes -> matmul -> twiddle -> swapaxes
                  -> matmul -> swapaxes (3 explicit transposes)
  * ``folded``  — einsum('bac,ak->bck') -> twiddle[c,k1] ->
                  einsum('bck,cJ->bJk'): ZERO explicit transposes, output
                  order IS the natural spectrum; same tables.

Also: does the (now faster) staged path beat the fused path at 65536/32768?

Usage: python scripts/ablate_fused_folded.py
"""

from __future__ import annotations

import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax import lax

from gpu_fft_tpu.kernels.fused import stage_a
from gpu_fft_tpu.kernels.fused_jnp import fused_fft_jnp, stage_b_jnp
from gpu_fft_tpu.kernels.tables import dft_matrix_ext, twiddle_table
from gpu_fft_tpu.plan import get_fused_plan, stage_a_col_tile
from gpu_fft_tpu.utils.profiling import chained_step_stats

_HI = lax.Precision.HIGHEST


def fused_folded(x, plan):
    """Real-input fused four-step with zero explicit transposes."""
    b, n = x.shape
    n1, n2 = plan.n1, plan.n2
    t = plan.tables
    x3 = x.reshape(b, n1, n2)  # [b, a, c]
    pr = jnp.einsum("bac,ak->bck", x3, t["f1r"], precision=_HI)
    pi = jnp.einsum("bac,ak->bck", x3, t["f1i"], precision=_HI)
    twr = t["twr"][None]  # (n2, n1) = [c, k1]
    twi = t["twi"][None]
    zr = pr * twr - pi * twi
    zi = pr * twi + pi * twr
    k1 = jnp.einsum("bck,cJ->bJk", zr + zi, t["f2r"], precision=_HI)
    k2 = jnp.einsum("bck,cJ->bJk", zr, t["f2d"], precision=_HI)
    k3 = jnp.einsum("bck,cJ->bJk", zi, t["f2s"], precision=_HI)
    return (k1 - k3).reshape(b, n), (k1 + k2).reshape(b, n)


def make_staged_tables(n: int):
    n1 = 128
    n2 = n // n1
    f1r, f1i, f1s, f1d = dft_matrix_ext(n1, -1)
    twr, twi = twiddle_table(n1, n2, n, -1)
    m1, m2 = n2 // 128, 128
    g1 = dft_matrix_ext(m1, -1)
    g2 = dft_matrix_ext(m2, -1)
    btwr, btwi = twiddle_table(m2, m1, n2, -1)
    return {
        "n1": n1, "n2": n2,
        "a": {"f1r": f1r, "f1i": f1i, "f1s": f1s, "f1d": f1d, "twr": twr, "twi": twi},
        "b": {"m1": m1, "m2": m2,
              "f1r": g1[0], "f1i": g1[1], "f1s": g1[2], "f1d": g1[3],
              "f2r": g2[0], "f2i": g2[1], "f2s": g2[2], "f2d": g2[3],
              "twr": btwr, "twi": btwi},
    }


def staged_at(x, t):
    b, n = x.shape
    n1, n2 = t["n1"], t["n2"]
    yr, yi = stage_a(x.reshape(b, n1, n2), None, n1, n2, t["a"], stage_a_col_tile(n1, n2))
    return stage_b_jnp(yr, yi, n1, n2, t["b"])


def main() -> None:
    rng = np.random.default_rng(21)
    results = {"platform": jax.default_backend(), "entries": []}

    def acc(fn, n):
        x = jnp.asarray(rng.standard_normal((1, n)).astype(np.float32))
        yr, yi = fn(x)
        ref = np.fft.fft(np.asarray(x[0]).astype(np.complex128))
        return float(max(np.abs(np.asarray(yr[0]) - ref.real).max(),
                         np.abs(np.asarray(yi[0]) - ref.imag).max()) / np.abs(ref).max())

    variants = {
        "current": lambda n: (lambda x: fused_fft_jnp(x, None, get_fused_plan(n, -1))),
        "folded": lambda n: (lambda x, p=None: fused_folded(x, get_fused_plan(n, -1))),
    }
    for name, make in variants.items():
        e = acc(make(65536), 65536)
        print(f"accuracy {name}: {e:.2e}", flush=True)
        assert e < 1e-5

    configs = [(1, 4096), (1, 16384), (1, 65536), (16, 4096), (16, 65536), (64, 4096)]
    times: dict = {}
    for rnd in range(2):
        for b, n in configs:
            x = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
            s = np.float32(1.0 / np.sqrt(n))
            for name, make in variants.items():
                fn = make(n)
                st = chained_step_stats(lambda xx: fn(xx)[0] * s, x, reps=3, min_span_s=0.05)
                times.setdefault((name, b, n), []).append(st.median_s)
                print(f"round{rnd} {name:8s} b{b:3d} n{n:6d}: {st.median_s * 1e6:8.2f} us "
                      f"(iqr {st.iqr_s * 1e6:.2f})", flush=True)

    # Staged path at fused sizes (boundary check).
    for n in (32768, 65536):
        t = make_staged_tables(n)
        e = acc(lambda x: staged_at(x, t), n)
        print(f"staged@{n} accuracy: {e:.2e}", flush=True)
        for rnd in range(2):
            for b in (1, 16):
                x = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
                s = np.float32(1.0 / np.sqrt(n))
                st = chained_step_stats(lambda xx: staged_at(xx, t)[0] * s, x, reps=3, min_span_s=0.05)
                times.setdefault(("staged", b, n), []).append(st.median_s)
                print(f"round{rnd} staged   b{b:3d} n{n:6d}: {st.median_s * 1e6:8.2f} us",
                      flush=True)

    for (name, b, n), ts in times.items():
        results["entries"].append({"variant": name, "batch": b, "n": n, "best_us": min(ts) * 1e6})
    pathlib.Path("scripts/ablate_fused_folded_results.json").write_text(json.dumps(results, indent=2))

    print("\n== winners ==")
    for b, n in configs + [(1, 32768), (16, 32768)]:
        row = {v: min(times[(v, b, n)]) * 1e6 for v in ("current", "folded", "staged")
               if (v, b, n) in times}
        if row:
            print(f"b{b} n{n}: " + "  ".join(f"{k}={v:.2f}us" for k, v in row.items())
                  + f"  -> {min(row, key=row.get)}")


if __name__ == "__main__":
    main()
