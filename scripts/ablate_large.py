"""Large-N staged-path ablation: stage-A engine and digit-size sweep.

Two questions, measured interleaved on real hardware:

1. Does the Pallas stage-A kernel still beat the jnp/einsum form of the same
   stage (the round-1 basis for keeping it) under the honest round-2 harness?
2. What stage-A digit n1 (hence stage-B row length n2 = n/n1) is fastest per
   N?  Round 1 fixed n1 = clamp(n/16384, 16, 512); the 46%-of-SoL reading at
   2^20 says there is headroom.

Also times the full auto path at n = 131072 so the real-input ("rfft")
selection table has a staged-path entry.

Usage: python scripts/ablate_large.py
"""

from __future__ import annotations

import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from gpu_fft_tpu.kernels.fused import stage_a
from gpu_fft_tpu.kernels.fused_jnp import stage_a_jnp
from gpu_fft_tpu.kernels.large import transform_any
from gpu_fft_tpu.kernels.tables import dft_matrix_ext, twiddle_table
from gpu_fft_tpu.plan import stage_a_col_tile
from gpu_fft_tpu.utils.profiling import chained_step_stats


def make_plan(n: int, n1: int, sign: int) -> dict:
    n2 = n // n1
    f1r, f1i, f1s, f1d = dft_matrix_ext(n1, sign)
    twr, twi = twiddle_table(n1, n2, n, sign)
    return {
        "n1": n1, "n2": n2,
        "f1r": f1r, "f1i": f1i, "f1s": f1s, "f1d": f1d,
        "twr": twr, "twi": twi,
    }


def staged_fft(x, plan: dict, engine: str):
    """One staged real forward transform with an explicit plan/engine."""
    b, n = x.shape
    n1, n2 = plan["n1"], plan["n2"]
    x3 = x.reshape(b, n1, n2)
    if engine == "jnp":
        yr, yi = stage_a_jnp(x3, None, plan)
    else:
        yr, yi = stage_a(x3, None, n1, n2, plan, stage_a_col_tile(n1, n2))
    rr, ri = transform_any(yr.reshape(b * n1, n2), yi.reshape(b * n1, n2), n2, -1)
    out_r = jnp.swapaxes(rr.reshape(b, n1, n2), 1, 2).reshape(b, n)
    out_i = jnp.swapaxes(ri.reshape(b, n1, n2), 1, 2).reshape(b, n)
    return out_r, out_i


def main() -> None:
    rng = np.random.default_rng(5)
    results = {"platform": jax.default_backend(), "entries": []}

    def time_step(fn, x, n):
        s = np.float32(1.0 / np.sqrt(n))

        def step(xx):
            yr, _ = fn(xx)
            return yr * s

        return chained_step_stats(step, x, reps=3, min_span_s=0.05)

    def accuracy(fn, n):
        x = jnp.asarray(rng.standard_normal((1, n)).astype(np.float32))
        yr, yi = fn(x)
        ref = np.fft.fft(np.asarray(x[0]).astype(np.complex128))
        s = np.abs(ref).max()
        return float(np.abs(np.asarray(yr[0]) - ref.real).max() / s)

    sweeps = {
        1 << 17: [16, 32, 64, 128],
        1 << 20: [32, 64, 128, 256],
        1 << 22: [128, 256, 512],
    }
    for rnd in range(2):
        for n, n1s in sweeps.items():
            x = jnp.asarray(rng.standard_normal((1, n)).astype(np.float32))
            for n1 in n1s:
                for engine in ("pallas", "jnp"):
                    plan = make_plan(n, n1, -1)
                    fn = lambda xx, p=plan, e=engine: staged_fft(xx, p, e)
                    if rnd == 0 and n1 == n1s[0] and engine == "pallas":
                        err = accuracy(fn, n)
                        assert err < 1e-4, (n, n1, engine, err)
                    st = time_step(fn, x, n)
                    results["entries"].append(
                        {"group": "staged", "n": n, "n1": n1, "engine": engine,
                         "round": rnd, "us": st.median_s * 1e6, "iqr_us": st.iqr_s * 1e6}
                    )
                    print(
                        f"round{rnd} n=2^{n.bit_length() - 1} n1={n1:4d} {engine:6s}: "
                        f"{st.median_s * 1e6:8.2f} us (iqr {st.iqr_s * 1e6:.2f})",
                        flush=True,
                    )

    # Full auto path at 131072 (for the real-input selection table).
    x = jnp.asarray(rng.standard_normal((1, 131072)).astype(np.float32))
    st = time_step(lambda xx: transform_any(xx, None, 131072, -1), x, 131072)
    results["entries"].append({"group": "auto", "n": 131072, "us": st.median_s * 1e6})
    print(f"auto n=131072: {st.median_s * 1e6:.2f} us", flush=True)

    out = pathlib.Path("scripts/ablate_large_results.json")
    out.write_text(json.dumps(results, indent=2))
    print(f"wrote {out}")

    best: dict = {}
    for e in results["entries"]:
        if e["group"] != "staged":
            continue
        key = (e["n"], e["n1"], e["engine"])
        best[key] = min(best.get(key, 1e9), e["us"])
    print("\n== staged winners ==")
    for n in sweeps:
        rows = {(n1, eng): v for (nn, n1, eng), v in best.items() if nn == n}
        top = min(rows, key=rows.get)
        print(f"n=2^{n.bit_length() - 1}: best n1={top[0]} engine={top[1]} "
              f"({rows[top]:.2f} us); all: " +
              "  ".join(f"{k[0]}/{k[1]}={v:.1f}" for k, v in sorted(rows.items())))


if __name__ == "__main__":
    main()
