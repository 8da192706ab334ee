"""Mosaic dot lowering duel: HIGHEST f32 vs manual bf16 6-pass decomposition.

docs/ABLATION.md §12 measured the in-kernel Mosaic HIGHEST f32 dot at ~2x
the per-block cost of XLA's lone HIGHEST dot (1.22 vs 0.59 us for a
(128,128)@(128,512) block) — the entire remaining stage-A gap at 2^20.
Hypothesis: Mosaic's HIGHEST lowering emits more/worse-scheduled passes
than the minimal 6-term bf16 decomposition, and issuing the six bf16
matmuls EXPLICITLY (constant LHS pre-split host-side, RHS split in-kernel
on the VPU) recovers the bare-pass rate.

Measures, per variant, the stage-A-shaped kernel (2 logical dots on a
(n1, n1) constant LHS against a (n1, ct) block, grid over columns):

  f32_highest   — shipped: jnp.dot at HIGHEST (Mosaic lowers the split)
  bf16_x6       — manual 6-term: LHS 3-way bf16 split host-side, RHS
                  3-way split in-kernel; products a1b1,a1b2,a2b1,a1b3,
                  a2b2,a3b1 accumulated in f32
  bf16_x1       — single raw bf16 pass (the floor: 1/6 of x6's MXU work)

and prints per-block dot cost + max rel error vs a float64 reference.

Run on TPU:  python scripts/ablate_mosaic_x6.py
"""

from __future__ import annotations

import functools
import sys

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def split3_bf16(a: np.ndarray):
    """Exact-sum 3-term bf16 split of an f32 array (hi + mid + lo ~ a)."""
    a = a.astype(np.float32)
    t1 = a.astype(jnp.bfloat16)
    r1 = a - np.asarray(t1, np.float32)
    t2 = r1.astype(jnp.bfloat16)
    r2 = r1 - np.asarray(t2, np.float32)
    t3 = r2.astype(jnp.bfloat16)
    return t1, t2, t3


def _bdot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _split3(x):
    x1 = x.astype(jnp.bfloat16)
    r1 = x - x1.astype(jnp.float32)
    x2 = r1.astype(jnp.bfloat16)
    r2 = r1 - x2.astype(jnp.float32)
    x3 = r2.astype(jnp.bfloat16)
    return x1, x2, x3


def _x6(a1, a2, a3, x1, x2, x3):
    """Six-term bf16 product ladder for a@x, f32 accumulation."""
    return (
        _bdot(a1, x1)
        + (_bdot(a1, x2) + _bdot(a2, x1))
        + (_bdot(a1, x3) + _bdot(a2, x2) + _bdot(a3, x1))
    )


def kern_f32(x_ref, fr, fi, yr_ref, yi_ref):
    xb = x_ref[0]
    yr_ref[0] = jnp.dot(fr[...], xb, precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
    yi_ref[0] = jnp.dot(fi[...], xb, precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)


def kern_x6(x_ref, fr1, fr2, fr3, fi1, fi2, fi3, yr_ref, yi_ref):
    x1, x2, x3 = _split3(x_ref[0])
    yr_ref[0] = _x6(fr1[...], fr2[...], fr3[...], x1, x2, x3)
    yi_ref[0] = _x6(fi1[...], fi2[...], fi3[...], x1, x2, x3)


def kern_x1(x_ref, fr, fi, yr_ref, yi_ref):
    xb = x_ref[0].astype(jnp.bfloat16)
    yr_ref[0] = _bdot(fr[...].astype(jnp.bfloat16), xb)
    yi_ref[0] = _bdot(fi[...].astype(jnp.bfloat16), xb)


def build(variant: str, n1: int, n2: int, ct: int, fr_np, fi_np):
    x_spec = pl.BlockSpec((1, n1, ct), lambda i, j: (i, 0, j),
                          memory_space=pltpu.VMEM)
    f_spec = pl.BlockSpec((n1, n1), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((1, n1, n2), jnp.float32)] * 2
    if variant == "bf16_x6":
        tabs = [jnp.asarray(t) for t in split3_bf16(fr_np) + split3_bf16(fi_np)]
        kern = kern_x6
    elif variant == "bf16_x1":
        tabs = [jnp.asarray(fr_np), jnp.asarray(fi_np)]
        kern = kern_x1
    else:
        tabs = [jnp.asarray(fr_np), jnp.asarray(fi_np)]
        kern = kern_f32
    call = pl.pallas_call(
        kern,
        grid=(1, n2 // ct),
        in_specs=[x_spec] + [f_spec] * len(tabs),
        out_specs=[x_spec, x_spec],
        out_shape=out_shape,
    )

    @jax.jit
    def run(x):
        return call(x, *tabs)

    return run


def main():
    from gpu_fft_tpu.config import enable_compilation_cache
    from gpu_fft_tpu.utils.profiling import chained_step_stats

    enable_compilation_cache()
    rng = np.random.default_rng(7)
    n1 = 128
    n2 = 8192
    for ct in (512, 1024):
        fr_np = rng.standard_normal((n1, n1)).astype(np.float32) * (1.0 / n1)
        fi_np = rng.standard_normal((n1, n1)).astype(np.float32) * (1.0 / n1)
        x = jnp.asarray(rng.standard_normal((1, n1, n2)).astype(np.float32))
        ref_r = np.asarray(fr_np, np.float64) @ np.asarray(x[0], np.float64)
        nrm = np.abs(ref_r).max()
        n_dots = 2 * (n2 // ct)  # logical dots per call
        for variant in ("f32_highest", "bf16_x6", "bf16_x1"):
            run = build(variant, n1, n2, ct, fr_np, fi_np)
            yr = np.asarray(run(x)[0][0], np.float64)
            err = np.abs(yr - ref_r).max() / nrm

            def step(z, run=run):
                yr, yi = run(z)
                # Keep both outputs live + renormalize so the chain is stable.
                return yr * jnp.float32(0.9) + yi * jnp.float32(1e-3) + z * jnp.float32(0.1)

            s = chained_step_stats(step, x, k1=5, k2=105, reps=5)
            print(
                f"ct={ct:5d} {variant:12s}: {s.median_s * 1e6:7.2f} us/call "
                f"({s.median_s * 1e6 / n_dots:6.3f} us/logical-dot)  "
                f"iqr={s.iqr_s * 1e6:5.2f}  rel_err={err:.2e}",
                flush=True,
            )


if __name__ == "__main__":
    main()
