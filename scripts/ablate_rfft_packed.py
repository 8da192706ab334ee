"""One-dot packed direct rfft vs the shipped 2-dot direct form (§28).

The §25 decomposition left the direct real FORWARD as the other padded
leg: the (n, h) tables produce 129-wide outputs whose dots pad to the
full lane grid, so the 2-dot form costs the same as two full (n, n)
dots.  The packed plan folds [C | S-interior] into ONE (n, n) table —
half the dot work, no padding — and PSD consumers reduce the packed
product without an unpack pass.  Interleaved chained head-to-head at
the two estimator hot shapes.
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

    from gpu_fft_tpu.config import enable_compilation_cache

    enable_compilation_cache()

    from gpu_fft_tpu.kernels.fused_jnp import (
        rfft_direct_packed_jnp,
        rfft_packed_psd_jnp,
    )
    from gpu_fft_tpu.ops.transform import rfft_device
    from gpu_fft_tpu.plan import get_rfft_direct_packed_plan
    from gpu_fft_tpu.utils.profiling import chained_step_stats

    out = pathlib.Path(__file__).with_name("ablate_rfft_packed_results.json")
    results = json.loads(out.read_text()) if out.exists() else {"rows": []}
    done = {(r["b"], r["n"], r["what"]) for r in results["rows"]}
    rng = np.random.default_rng(7)

    def t(step, x0):
        return min(
            chained_step_stats(step, x0, k1=30, k2=530, reps=3).median_s
            for _ in range(2)
        )

    for b, n in ((253, 256), (511, 256), (64, 512)):
        p = get_rfft_direct_packed_plan(n)
        x0 = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
        sc = np.float32(1.0 / n)

        # Forward: shipped 2-dot one-sided vs packed 1-dot (both return a
        # shape-stable (b, n) carry: the packed product / the repacked
        # concat the stft pipeline uses anyway).
        def fwd_shipped(f):
            fr, fi = rfft_device(f)
            return jnp.concatenate([fr, fi[..., 1:-1]], axis=-1) * sc

        def fwd_packed(f):
            return rfft_direct_packed_jnp(f, p)[0] * sc

        # PSD: shipped rfft + re^2+im^2 vs the packed fold (carry (b, n):
        # psd padded back to width n so the chain is shape-stable).
        def psd_shipped(f):
            fr, fi = rfft_device(f)
            ps = fr * fr + fi * fi
            return jnp.pad(ps, ((0, 0), (0, n - ps.shape[-1]))) * sc

        def psd_packed(f):
            ps = rfft_packed_psd_jnp(f, p)
            return jnp.pad(ps, ((0, 0), (0, n - ps.shape[-1]))) * sc

        for what, a_fn, b_fn in (
            ("fwd", fwd_shipped, fwd_packed),
            ("psd", psd_shipped, psd_packed),
        ):
            if (b, n, what) in done:
                continue
            pa = np.asarray(jax.jit(a_fn)(x0))
            pb = np.asarray(jax.jit(b_fn)(x0))
            par = float(np.abs(pa - pb).max() / max(np.abs(pa).max(), 1e-9))
            ta1, tb1 = t(a_fn, x0), t(b_fn, x0)
            ta2, tb2 = t(a_fn, x0), t(b_fn, x0)
            row = {
                "b": b, "n": n, "what": what,
                "shipped_us": min(ta1, ta2) * 1e6,
                "packed_us": min(tb1, tb2) * 1e6,
                "speedup": min(ta1, ta2) / min(tb1, tb2),
                "parity": par,
            }
            results["rows"].append(row)
            out.write_text(json.dumps(results, indent=1))
            print(
                f"{what} b={b} n={n}: shipped {row['shipped_us']:6.2f} "
                f"packed {row['packed_us']:6.2f} us -> {row['speedup']:.2f}x par={par:.1e}",
                flush=True,
            )
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
