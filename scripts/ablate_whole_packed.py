"""Packed single-operand whole-kernel vs the 7-operand form (round 5, §24).

The pallas probes (calibrate_latency.py) put a minimal pallas_call at
0.39 us while whole_transform at n=1024 runs 2.34 us — the gap is serial
in-kernel cost: per-operand DMA issue plus 5-6 serial small dots.  Two
measurements here:

  1. the per-operand DMA-issue cost, isolated: a trivial kernel summing
     k (128, 128) table operands, k = 1, 2, 4, 8;
  2. whole_transform (W1, 7-8 operands, 5-6 dots) vs
     whole_transform_packed (W2, 1 packed operand, 3-4 stacked dots) vs
     the shipped XLA schedule, interleaved, B=1 over the gated band.

Writes scripts/ablate_whole_packed_results.json (incremental, resumable).
"""

from __future__ import annotations

import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from gpu_fft_tpu.config import enable_compilation_cache

    enable_compilation_cache()

    from gpu_fft_tpu.kernels.fused import whole_transform, whole_transform_packed
    from gpu_fft_tpu.plan import get_whole_packed_plan, get_whole_plan
    from gpu_fft_tpu.utils.profiling import chained_step_stats

    out = pathlib.Path(__file__).with_name("ablate_whole_packed_results.json")
    if out.exists():
        results = json.loads(out.read_text())
    else:
        results = {"device": str(jax.devices()[0]), "operand_probe": {}, "rows": []}
    done = {(r["kind"], r["n"]) for r in results["rows"]}
    rng = np.random.default_rng(7)

    def t(step, x0):
        s = chained_step_stats(step, x0, k1=30, k2=530, reps=4)
        return s.median_s

    # ── 1. Per-operand DMA issue cost ───────────────────────────────────────
    if not results["operand_probe"]:
        tables = [jnp.asarray(rng.standard_normal((128, 128)).astype(np.float32)) for _ in range(8)]

        def probe(k):
            def kernel(x_ref, *refs):
                o_ref = refs[-1]
                acc = x_ref[...] * np.float32(1.0 + 2.0 ** -20)
                for r in refs[:-1]:
                    acc += r[0:8, :] * np.float32(2.0 ** -24)
                o_ref[...] = acc

            def step(x):
                return pl.pallas_call(
                    kernel,
                    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                )(x, *tables[:k])

            return step

        x0 = jnp.ones((8, 128), jnp.float32)
        for k in (0, 1, 2, 4, 8):
            us = t(probe(k), x0) * 1e6
            results["operand_probe"][str(k)] = us
            print(f"operand probe k={k}: {us:.3f} us/call", flush=True)
        out.write_text(json.dumps(results, indent=1))

    # ── 2. W1 vs W2 vs shipped, B=1 over the band ──────────────────────────
    from gpu_fft_tpu.kernels.fused_jnp import fused_fft_jnp_folded
    from gpu_fft_tpu.plan import get_fused_plan

    for complex_in in (False, True):
        tag = "complex" if complex_in else "real"
        for n in (1024, 2048, 4096, 8192, 16384):
            if (tag, n) in done:
                continue
            s = np.float32(1.0 / np.sqrt(n))
            p1 = get_whole_plan(n, -1)
            p2 = get_whole_packed_plan(n, -1)
            # The PRE-round-5 shipped XLA schedule (folded four-step),
            # independent of the now-open whole gate.
            fp = get_fused_plan(n, -1, wide=False)

            if complex_in:
                w1 = lambda x: whole_transform(x, x, p1)[0] * s
                w2 = lambda x: whole_transform_packed(x, x, p2)[0] * s
                xla = lambda x: fused_fft_jnp_folded(x, x, fp)[0] * s
            else:
                w1 = lambda x: whole_transform(x, None, p1)[0] * s
                w2 = lambda x: whole_transform_packed(x, None, p2)[0] * s
                xla = lambda x: fused_fft_jnp_folded(x, None, fp)[0] * s

            x0 = jnp.asarray(rng.standard_normal((1, n)).astype(np.float32))
            a = np.asarray(jax.jit(w1)(x0))
            b = np.asarray(jax.jit(w2)(x0))
            par = float(np.abs(a - b).max() / max(np.abs(a).max(), 1e-9))
            # Interleaved A/B/C/A/B/C
            t1a, t2a, txa = t(w1, x0), t(w2, x0), t(xla, x0)
            t1b, t2b, txb = t(w1, x0), t(w2, x0), t(xla, x0)
            row = {
                "kind": tag, "n": n,
                "w1_us": min(t1a, t1b) * 1e6,
                "w2_us": min(t2a, t2b) * 1e6,
                "xla_us": min(txa, txb) * 1e6,
                "w2_vs_w1": min(t1a, t1b) / min(t2a, t2b),
                "w2_vs_xla": min(txa, txb) / min(t2a, t2b),
                "parity": par,
            }
            results["rows"].append(row)
            out.write_text(json.dumps(results, indent=1))
            print(
                f"{tag} n={n:6d}: W1 {row['w1_us']:6.2f}  W2 {row['w2_us']:6.2f}  "
                f"xla {row['xla_us']:6.2f} us -> W2/W1 {row['w2_vs_w1']:.2f}x "
                f"W2/xla {row['w2_vs_xla']:.2f}x  par={par:.1e}",
                flush=True,
            )

    print(f"wrote {out}")


if __name__ == "__main__":
    main()
