"""Stage-B ablation: how to realize the output digit reversal.

Three candidates for the staged path's stage B (row FFTs of length n2 over
a (B, n1, n2) stage-A output, followed by the global digit reversal to
natural order):

  * ``current``   — jnp row four-step (transform_any) + separate XLA
                    transpose pass (the round-1 structure, n1=128 rule)
  * ``einsum``    — row four-step as einsums whose OUTPUT PERMUTATION is the
                    digit reversal ('bkcj,cJ->bJjk'): XLA folds the
                    transpose into the dot's output layout instead of
                    materializing an HBM transpose pass
  * (retired)     — a fused Pallas stage-B kernel measured 64.8 us at 2^17
                    vs 9.4 for `current`: Mosaic's lane tiling forces m1 =
                    n2/128 skinny matmuls and two full re-rank transposes in
                    VMEM, costing far more than the saved HBM pass.  Kept
                    here as a record; see docs/ABLATION.md.

Usage: python scripts/ablate_stage_b.py
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
from gpu_fft_tpu.kernels.large import transform_any
from gpu_fft_tpu.kernels.tables import dft_matrix_ext, twiddle_table
from gpu_fft_tpu.plan import get_stage_a_plan, stage_a_col_tile
from gpu_fft_tpu.utils.profiling import chained_step_stats

_HI = lax.Precision.HIGHEST


def make_sb_tables(n2: int, sign: int) -> dict:
    m1, m2 = n2 // 128, 128
    f1 = dft_matrix_ext(m1, sign)
    f2 = dft_matrix_ext(m2, sign)
    twr, twi = twiddle_table(m2, m1, n2, sign)
    return {
        "m1": m1, "m2": m2,
        "f1r": f1[0], "f1s": f1[2], "f1d": f1[3],
        "f2r": f2[0], "f2s": f2[2], "f2d": f2[3],
        "twr": twr, "twi": twi,
    }


def stage_b_einsum(yr, yi, n1, n2, t):
    b = yr.shape[0]
    m1, m2 = t["m1"], t["m2"]
    zr = yr.reshape(b, n1, m1, m2)
    zi = yi.reshape(b, n1, m1, m2)

    def s1(xr_, xi_):
        k1 = jnp.einsum("bkac,aj->bkcj", xr_ + xi_, t["f1r"], precision=_HI)
        k2 = jnp.einsum("bkac,aj->bkcj", xr_, t["f1d"], precision=_HI)
        k3 = jnp.einsum("bkac,aj->bkcj", xi_, t["f1s"], precision=_HI)
        return k1 - k3, k1 + k2

    pr, pi = s1(zr, zi)
    twr = t["twr"][None, None]
    twi = t["twi"][None, None]
    wr = pr * twr - pi * twi
    wi = pr * twi + pi * twr

    def s2(xr_, xi_):
        k1 = jnp.einsum("bkcj,cJ->bJjk", xr_ + xi_, t["f2r"], precision=_HI)
        k2 = jnp.einsum("bkcj,cJ->bJjk", xr_, t["f2d"], precision=_HI)
        k3 = jnp.einsum("bkcj,cJ->bJjk", xi_, t["f2s"], precision=_HI)
        return k1 - k3, k1 + k2

    rr, ri = s2(wr, wi)
    n = n1 * n2
    return rr.reshape(b, n), ri.reshape(b, n)


def staged_fft(x, variant: str):
    b, n = x.shape
    plan = get_stage_a_plan(n, -1)
    n1, n2 = plan["n1"], plan["n2"]
    yr, yi = stage_a(x.reshape(b, n1, n2), None, n1, n2, plan, stage_a_col_tile(n1, n2))
    if variant == "einsum":
        return stage_b_einsum(yr, yi, n1, n2, make_sb_tables(n2, -1))
    rr, ri = transform_any(yr.reshape(b * n1, n2), yi.reshape(b * n1, n2), n2, -1)
    out_r = jnp.swapaxes(rr.reshape(b, n1, n2), 1, 2).reshape(b, n)
    out_i = jnp.swapaxes(ri.reshape(b, n1, n2), 1, 2).reshape(b, n)
    return out_r, out_i


def main() -> None:
    rng = np.random.default_rng(9)
    results = {"platform": jax.default_backend(), "entries": []}

    # Accuracy sanity at one size.
    n = 1 << 17
    x = jnp.asarray(rng.standard_normal((1, n)).astype(np.float32))
    ref = np.fft.fft(np.asarray(x[0]).astype(np.complex128))
    for v in ("current", "einsum"):
        yr, yi = staged_fft(x, v)
        err = float(
            max(np.abs(np.asarray(yr[0]) - ref.real).max(),
                np.abs(np.asarray(yi[0]) - ref.imag).max()) / np.abs(ref).max()
        )
        print(f"accuracy {v}: {err:.2e}", flush=True)
        assert err < 1e-5

    for rnd in range(2):
        for n in (1 << 17, 1 << 18, 1 << 20, 1 << 22):
            x = jnp.asarray(rng.standard_normal((1, n)).astype(np.float32))
            s = np.float32(1.0 / np.sqrt(n))
            for v in ("current", "einsum"):
                st = chained_step_stats(
                    lambda xx, vv=v: staged_fft(xx, vv)[0] * s, x, reps=3, min_span_s=0.05
                )
                results["entries"].append(
                    {"n": n, "variant": v, "round": rnd, "us": st.median_s * 1e6}
                )
                print(
                    f"round{rnd} n=2^{n.bit_length() - 1} {v:8s}: {st.median_s * 1e6:8.2f} us "
                    f"(iqr {st.iqr_s * 1e6:.2f})",
                    flush=True,
                )

    pathlib.Path("scripts/ablate_stage_b_results.json").write_text(json.dumps(results, indent=2))
    best: dict = {}
    for e in results["entries"]:
        key = (e["n"], e["variant"])
        best[key] = min(best.get(key, 1e9), e["us"])
    print("\n== stage-B winners ==")
    for n in (1 << 17, 1 << 18, 1 << 20, 1 << 22):
        row = {v: best[(n, v)] for v in ("current", "einsum")}
        print(f"n=2^{n.bit_length() - 1}: " + "  ".join(f"{k}={v:.2f}us" for k, v in row.items())
              + f"  -> {min(row, key=row.get)}")


if __name__ == "__main__":
    main()
