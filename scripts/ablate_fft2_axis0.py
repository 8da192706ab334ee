"""Ablate the fft2 column leg: axis-0 folded einsums vs transpose+rows+transpose.

The 2-D transform's column pass has two candidate forms:

  (T) transpose -> batched row transform -> transpose back (2 relayout
      passes per array, 4 total for split-complex), reusing transform_any;
  (A) the four-step contractions applied along axis 0 directly, with the
      width as a free trailing (lane) axis — same tables, einsums
      'acw,ak->ckw' / 'ckw,cJ->Jkw' (digit reversal folded into the output
      order, like fused_fft_jnp_folded) — zero relayout passes.

Run on hardware: python scripts/ablate_fft2_axis0.py
Writes scripts/ablate_fft2_axis0_results.json: BOTH the isolated column
leg AND the composed fft2_device pipeline with the gate forced on/off.
THE TWO DISAGREE — the isolated form wins 1.03-1.13x but the composed
form loses 0.57-0.87x, because the chained harness lets XLA choose the
loop-carry layout (einsum-friendly in isolation) while the real pipeline
pins the row pass's output layout.  The composed table is the one the
tuning gate is derived from (OFF on v5e); docs/ABLATION.md §19.
"""

import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from gpu_fft_tpu.kernels.large import transform_any
from gpu_fft_tpu.utils.profiling import chained_step_stats


def time_pair(h: int, w: int, complex_input: bool):
    from gpu_fft_tpu.kernels.fused_jnp import transform_axis0

    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32)) if complex_input else None

    def step_t(v):
        cr = jnp.swapaxes(v, 0, 1)
        ci = None if xi is None else jnp.swapaxes(xi, 0, 1)
        sr, si = transform_any(cr, ci, h, -1)
        return jnp.swapaxes(sr, 0, 1) + jnp.swapaxes(si, 0, 1)

    def step_a(v):
        sr, si = transform_axis0(v, xi, h, -1)
        return sr + si

    tt = chained_step_stats(step_t, xr)
    ta = chained_step_stats(step_a, xr)
    return tt.median_s * 1e6, ta.median_s * 1e6


def time_composed(h: int, w: int):
    import gpu_fft_tpu.ops.fft2d as f2
    import gpu_fft_tpu.plan as plan

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32))
    saved = plan.axis0_applies
    try:
        plan.axis0_applies = lambda *a: False
        t_off = chained_step_stats(lambda v: f2.fft2_device(v)[0], img).median_s * 1e6
        plan.axis0_applies = lambda *a: True
        t_on = chained_step_stats(lambda v: f2.fft2_device(v)[0], img).median_s * 1e6
    finally:
        plan.axis0_applies = saved
    return t_off, t_on


def main() -> None:
    rows = []
    for h in (256, 1024, 4096, 16384):
        for w in (128, 512, 2048, 4096):
            if h * w > (1 << 24):  # keep within comfortable HBM/time budget
                continue
            for cx in (False, True):
                t_us, a_us = time_pair(h, w, cx)
                rows.append({
                    "h": h, "w": w, "complex": cx,
                    "transpose_us": round(t_us, 2), "axis0_us": round(a_us, 2),
                    "speedup": round(t_us / a_us, 3),
                })
                print(f"h={h:6d} w={w:5d} complex={int(cx)}  "
                      f"T {t_us:9.2f}  A {a_us:9.2f}  x{t_us/a_us:.2f}")
    composed = []
    for h, w in ((2048, 512), (2048, 1024), (2048, 2048), (4096, 512),
                 (4096, 1024), (4096, 2048), (4096, 4096), (8192, 512),
                 (8192, 2048)):
        t_off, t_on = time_composed(h, w)
        composed.append({"h": h, "w": w, "fft2_transpose_us": round(t_off, 2),
                         "fft2_axis0_us": round(t_on, 2),
                         "speedup": round(t_off / t_on, 3)})
        print(f"composed {h}x{w}: T {t_off:9.1f}  A {t_on:9.1f}  x{t_off/t_on:.2f}")
    out = pathlib.Path(__file__).with_name("ablate_fft2_axis0_results.json")
    out.write_text(json.dumps({"isolated_leg": rows, "composed_fft2": composed}, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
