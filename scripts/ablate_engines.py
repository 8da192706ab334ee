"""Engine ablation: hand-written Pallas kernels vs the XLA-scheduled graph.

Round-1 finding: the jnp four-step graph beats the fused Pallas kernels at
every fused size.  This script is the round-2 attack on that result — it
measures, interleaved in one process on real hardware:

  * ``jnp``        — fused_fft_jnp, the current default (3 transposes,
                     right-matmuls; XLA-scheduled)
  * ``jnp_lm``     — left-matmul jnp form: stage 1 contracts the MAJOR digit
                     via einsum, killing 2 of the 3 transposes
  * ``pallas``     — fused_fft, the round-1 kernel (3 in-kernel transposes)
  * ``pallas_lm``  — new left-matmul Pallas kernel (1 in-kernel transpose)

plus the rfft decision data (fused_rfft kernel vs the plain real four-step
at each candidate size).  Output: one JSON blob
(scripts/ablate_engines_results.json) + a console table; the conclusions
feed docs/ABLATION.md and the plan's per-size selection.

NOTE: the losing kernels (fused_fft, fused_rfft and their plans) were
RETIRED from the package based on this script's results.  The archived
results JSON is committed; to re-run the script against the retired
kernels, restore them first:

    git checkout 2a28549 -- gpu_fft_tpu/kernels/fused.py gpu_fft_tpu/plan.py

Usage: python scripts/ablate_engines.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpu_fft_tpu.kernels.fused import (
    _cmatmul,
    _const_spec,
    _dot,
    _interpret,
    _vmem_spec,
    fused_fft,
    fused_rfft,
)
from gpu_fft_tpu.kernels.fused_jnp import fused_fft_jnp
from gpu_fft_tpu.kernels.tables import dft_matrix_ext, twiddle_table
from gpu_fft_tpu.plan import balanced_split, batch_tile, get_fused_plan, get_rfft_plan
from gpu_fft_tpu.utils.profiling import chained_step_stats

_HI = lax.Precision.HIGHEST


# ── Left-matmul tables (twiddle oriented (n1, n2) = [k1, col]) ───────────────


def lm_tables(n: int, sign: int) -> dict:
    n1, n2 = balanced_split(n)
    f1r, f1i, f1s, f1d = dft_matrix_ext(n1, sign)
    f2r, f2i, f2s, f2d = dft_matrix_ext(n2, sign)
    twr, twi = twiddle_table(n1, n2, n, sign)
    return {
        "n1": n1, "n2": n2,
        "f1r": f1r, "f1i": f1i, "f1s": f1s, "f1d": f1d,
        "f2r": f2r, "f2i": f2i, "f2s": f2s, "f2d": f2d,
        "twr": twr, "twi": twi,
    }


# ── Variant: left-matmul Pallas kernel (real input) ──────────────────────────


def _lm_real_kernel(x_ref, f1r, f1i, twr, twi, f2r, f2i, f2s, f2d, yr_ref, yi_ref):
    bt, n1, n2 = x_ref.shape
    prs, pis = [], []
    for i in range(bt):  # bt is static; unrolled left matmuls per batch slice
        xb = x_ref[i]
        prs.append(_dot(f1r[...], xb))
        pis.append(_dot(f1i[...], xb))
    pr = jnp.stack(prs)
    pi = jnp.stack(pis)
    zr = pr * twr[...][None] - pi * twi[...][None]
    zi = pr * twi[...][None] + pi * twr[...][None]
    rr, ri = _cmatmul(
        zr.reshape(bt * n1, n2),
        zi.reshape(bt * n1, n2),
        (f2r[...], f2i[...], f2s[...], f2d[...]),
    )
    yr_ref[...] = jnp.swapaxes(rr.reshape(bt, n1, n2), 1, 2)
    yi_ref[...] = jnp.swapaxes(ri.reshape(bt, n1, n2), 1, 2)


def fused_fft_pallas_lm(x, t: dict):
    b, n = x.shape
    n1, n2 = t["n1"], t["n2"]
    bt = batch_tile(n, complex_input=False)
    bpad = -b % bt
    if bpad:
        x = jnp.pad(x, ((0, bpad), (0, 0)))
    bp = b + bpad
    names = ("f1r", "f1i", "twr", "twi", "f2r", "f2i", "f2s", "f2d")
    yr, yi = pl.pallas_call(
        _lm_real_kernel,
        grid=(bp // bt,),
        in_specs=[_vmem_spec((bt, n1, n2), lambda i: (i, 0, 0))]
        + [_const_spec(t[k].shape) for k in names],
        out_specs=[_vmem_spec((bt, n2, n1), lambda i: (i, 0, 0))] * 2,
        out_shape=[jax.ShapeDtypeStruct((bp, n2, n1), jnp.float32)] * 2,
        interpret=_interpret(),
    )(x.reshape(bp, n1, n2), *(t[k] for k in names))
    return yr.reshape(bp, n)[:b], yi.reshape(bp, n)[:b]


# ── Variant: left-matmul jnp form (real input) ───────────────────────────────


def fused_fft_jnp_lm(x, t: dict):
    b, n = x.shape
    n1, n2 = t["n1"], t["n2"]
    x3 = x.reshape(b, n1, n2)
    pr = jnp.einsum("ka,bac->bkc", t["f1r"], x3, precision=_HI)
    pi = jnp.einsum("ka,bac->bkc", t["f1i"], x3, precision=_HI)
    zr = pr * t["twr"][None] - pi * t["twi"][None]
    zi = pr * t["twi"][None] + pi * t["twr"][None]
    k1 = _dot(zr.reshape(b * n1, n2) + zi.reshape(b * n1, n2), t["f2r"])
    k2 = _dot(zr.reshape(b * n1, n2), t["f2d"])
    k3 = _dot(zi.reshape(b * n1, n2), t["f2s"])
    rr, ri = k1 - k3, k1 + k2
    yr = jnp.swapaxes(rr.reshape(b, n1, n2), 1, 2).reshape(b, n)
    yi = jnp.swapaxes(ri.reshape(b, n1, n2), 1, 2).reshape(b, n)
    return yr, yi


# ── Harness ──────────────────────────────────────────────────────────────────


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--rounds", type=int, default=2)
    args = ap.parse_args()

    rng = np.random.default_rng(11)
    results = {"platform": jax.default_backend(), "device": str(jax.devices()[0]), "entries": []}

    def accuracy(fn, n):
        x = jnp.asarray(rng.standard_normal((1, n)).astype(np.float32))
        yr, yi = fn(x)
        ref = np.fft.fft(np.asarray(x[0]).astype(np.complex128))
        scale = np.abs(ref).max()
        return float(
            max(
                np.abs(np.asarray(yr[0]) - ref.real).max(),
                np.abs(np.asarray(yi[0]) - ref.imag).max(),
            )
            / scale
        )

    def step_of(fn, n):
        s = np.float32(1.0 / np.sqrt(n))

        def step(x):
            yr, _ = fn(x)
            return yr * s

        return step

    configs = [(1, 4096), (1, 16384), (1, 65536), (16, 4096), (16, 65536), (64, 4096)]
    if args.quick:
        configs = [(1, 65536), (16, 65536)]

    variants = {
        "jnp": lambda n: (lambda x: fused_fft_jnp(x, None, get_fused_plan(n, -1))),
        "jnp_lm": lambda n: (lambda x, t=lm_tables(n, -1): fused_fft_jnp_lm(x, t)),
        "pallas": lambda n: (lambda x: fused_fft(x, None, get_fused_plan(n, -1))),
        "pallas_lm": lambda n: (lambda x, t=lm_tables(n, -1): fused_fft_pallas_lm(x, t)),
    }

    # Accuracy first (also catches kernel bugs before paying for timing).
    for name, make in variants.items():
        err = accuracy(make(65536), 65536)
        print(f"accuracy {name}: rel err {err:.2e}", flush=True)
        results["entries"].append({"group": "accuracy", "variant": name, "rel_err": err})

    # Interleaved timing: all variants per config per round.
    times: dict = {}
    for rnd in range(args.rounds):
        for b, n in configs:
            x = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
            for name, make in variants.items():
                st = chained_step_stats(step_of(make(n), n), x, reps=3, min_span_s=0.05)
                key = (name, b, n)
                times.setdefault(key, []).append(st.median_s)
                print(
                    f"round{rnd} {name:10s} b{b:3d} n{n:6d}: {st.median_s * 1e6:8.2f} us "
                    f"(iqr {st.iqr_s * 1e6:.2f})",
                    flush=True,
                )

    for (name, b, n), ts in times.items():
        results["entries"].append(
            {
                "group": "engine",
                "variant": name,
                "batch": b,
                "n": n,
                "best_us": min(ts) * 1e6,
                "all_us": [t * 1e6 for t in ts],
            }
        )

    # rfft decision data: fused rfft kernel vs plain real four-step (jnp + lm).
    if not args.quick:
        for n in (32768, 65536, 131072):
            x = jnp.asarray(rng.standard_normal((1, n)).astype(np.float32))
            cand = {
                "rfft_pallas": lambda xx, n=n: fused_rfft(xx, get_rfft_plan(n)),
            }
            if n <= 65536:
                cand["real_jnp"] = lambda xx, n=n: fused_fft_jnp(xx, None, get_fused_plan(n, -1))
                cand["real_jnp_lm"] = lambda xx, t=lm_tables(n, -1): fused_fft_jnp_lm(xx, t)
            for name, fn in cand.items():
                st = chained_step_stats(step_of(fn, n), x, reps=3, min_span_s=0.05)
                print(f"rfft n{n} {name:12s}: {st.median_s * 1e6:8.2f} us", flush=True)
                results["entries"].append(
                    {"group": "rfft", "variant": name, "batch": 1, "n": n, "best_us": st.median_s * 1e6}
                )

    out = pathlib.Path("scripts/ablate_engines_results.json")
    out.write_text(json.dumps(results, indent=2))
    print(f"wrote {out}")

    # Decision summary.
    print("\n== engine winners ==")
    for b, n in configs:
        row = {name: min(times[(name, b, n)]) for name in variants if (name, b, n) in times}
        best = min(row, key=row.get)
        line = "  ".join(f"{k}={v * 1e6:.2f}us" for k, v in row.items())
        print(f"b{b} n{n}: {line}  -> {best}")


if __name__ == "__main__":
    main()
