"""Ablation study of the fused four-step kernel's per-program cost.

Builds kernel variants with pieces removed (twiddle, transposes, second
matmul) and times them interleaved in one process.  (A transpose-free
per-batch-row LEFT-matmul formulation was also measured — identical time,
so the transposes are not the bottleneck.)  Used to attribute the gap to HBM roofline; results feed the
kernel-tuning decisions.  Not part of the library runtime.

Usage: python scripts/ablate_fourstep.py [B] [n]
"""

from __future__ import annotations

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpu_fft_tpu.plan import batch_tile, get_fused_plan
from gpu_fft_tpu.utils.profiling import chained_step_time


def _dot(a, b):
    return jnp.dot(a, b, precision=lax.Precision.HIGHEST, preferred_element_type=jnp.float32)


def build(n, variant):
    plan = get_fused_plan(n, -1)
    t = plan.tables
    n1, n2 = plan.n1, plan.n2
    bt = batch_tile(n, False)

    def kernel(x_ref, f1r, f1i, twr, twi, f2r, f2i, yr_ref, yi_ref):
        bt_ = x_ref.shape[0]
        x = x_ref[...]
        xt = jnp.swapaxes(x, 1, 2).reshape(bt_ * n2, n1)
        pr = _dot(xt, f1r[...])
        pi = _dot(xt, f1i[...])
        if variant == "step1only":
            yr_ref[...] = pr.reshape(bt_, n2, n1)
            yi_ref[...] = pi.reshape(bt_, n2, n1)
            return
        p3r = pr.reshape(bt_, n2, n1)
        p3i = pi.reshape(bt_, n2, n1)
        if variant == "notwiddle":
            zr, zi = p3r, p3i
        else:
            zr = p3r * twr[...][None] - p3i * twi[...][None]
            zi = p3r * twi[...][None] + p3i * twr[...][None]
        if variant == "notranspose2":
            qr = zr.reshape(bt_ * n2, n1)
            qi = zi.reshape(bt_ * n2, n1)
            rr = _dot(qr, f1r[...])
            ri = _dot(qi, f1r[...])
            yr_ref[...] = rr.reshape(bt_, n2, n1)
            yi_ref[...] = ri.reshape(bt_, n2, n1)
            return
        qr = jnp.swapaxes(zr, 1, 2).reshape(bt_ * n1, n2)
        qi = jnp.swapaxes(zi, 1, 2).reshape(bt_ * n1, n2)
        rr = _dot(qr, f2r[...]) - _dot(qi, f2i[...])
        ri = _dot(qr, f2i[...]) + _dot(qi, f2r[...])
        yr_ref[...] = jnp.swapaxes(rr.reshape(bt_, n1, n2), 1, 2)
        yi_ref[...] = jnp.swapaxes(ri.reshape(bt_, n1, n2), 1, 2)

    cs = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)

    def call(x):
        b = x.shape[0]
        if b % bt:
            raise ValueError(f"B={b} must be a multiple of the batch tile {bt}")
        grid = (b // bt,)
        yr, yi = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec((bt, n1, n2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)]
            + [cs(t[k].shape) for k in ("f1r", "f1i", "twr", "twi", "f2r", "f2i")],
            out_specs=[pl.BlockSpec((bt, n2, n1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)] * 2,
            out_shape=[jax.ShapeDtypeStruct((b, n2, n1), jnp.float32)] * 2,
        )(x.reshape(b, n1, n2), *(t[k] for k in ("f1r", "f1i", "twr", "twi", "f2r", "f2i")))
        return yr.reshape(b, n), yi.reshape(b, n)

    return call


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, n)).astype(np.float32))
    s = np.float32(1.0 / np.sqrt(n))
    variants = ["full", "notwiddle", "step1only", "notranspose2"]
    fns = {}
    for v in variants:
        try:
            f = build(n, v)
            jax.block_until_ready(f(x))
            fns[v] = f
        except Exception as e:
            print(f"{v}: BUILD FAIL {str(e)[:100]}", flush=True)
    for v, f in fns.items():
        tm = chained_step_time(lambda xx, f=f: f(xx)[0] * s, x, k1=50, k2=1050, reps=4)
        print(f"{v:16s} {tm * 1e6:8.2f} us", flush=True)


if __name__ == "__main__":
    main()
