"""Whole-transform single-kernel vs the XLA-scheduled four-step (round 5).

Round-4 verdict item 1: n = 1024..16384 at B = 1 are `bound: latency` at
42-50% SoL — the XLA schedule compiles to ~11 fusions and 11 launches cost
1.21 us against a 2.44 us measured row (fft_n1024).  The reference fuses
everything below TILE into ONE dispatch (src/butterfly.rs:84-147); this
script measures the TPU translation (kernels/fused.py:whole_transform —
whole four-step in one pallas_call) head-to-head against the shipped
dispatch, interleaved, on the real chip.

Outputs:
  1. the fusion INVENTORY of the shipped dispatch per size (what the 11
     kernels actually are, classified from the compiled HLO);
  2. the measured (B, n) win/loss table -> sets tuning.whole_* gates;
  3. results JSON at scripts/ablate_whole_kernel_results.json.
"""

from __future__ import annotations

import json
import pathlib
import re
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def classify_fusions(txt: str) -> list[str]:
    """Name each fusion/custom-call in a compiled HLO module by its root op."""
    out = []
    for m in re.finditer(r"^\s*(?:ROOT )?%?(fusion[\w.]*)\s*=\s*([^\n]*)", txt, re.M):
        line = m.group(2)
        kind = "elementwise"
        if "kind=kOutput" in line and "dot" in txt:
            kind = "output-fused"
        for tag, name in (
            ("custom_call", "custom-call"),
            ("transpose", "transpose"),
            ("concatenate", "concat"),
            ("dot(", "dot"),
        ):
            if tag in line:
                kind = name
        out.append(f"{m.group(1)}:{kind}:{line.split(' calls=')[0][:90]}")
    return out


def main() -> None:
    import jax
    import jax.numpy as jnp

    from gpu_fft_tpu.config import enable_compilation_cache

    enable_compilation_cache()

    from gpu_fft_tpu.kernels.fused import whole_transform
    from gpu_fft_tpu.kernels.large import transform_any
    from gpu_fft_tpu.plan import get_whole_plan
    from gpu_fft_tpu.utils.profiling import chained_step_stats
    from gpu_fft_tpu.utils.roofline import compiled_stats

    rng = np.random.default_rng(7)
    out = pathlib.Path(__file__).with_name("ablate_whole_kernel_results.json")
    # Incremental + resumable: the tunnel can drop mid-run (round-5 first
    # attempt died at row 46/56 on a remote_compile disconnect), so every
    # row is persisted as it lands and measured rows are skipped on rerun.
    if out.exists():
        results = json.loads(out.read_text())
    else:
        results = {"device": str(jax.devices()[0]), "rows": []}
    done = {(r["kind"], r["b"], r["n"]) for r in results["rows"]}

    def step_current(n, complex_in):
        s = np.float32(1.0 / np.sqrt(n))
        if complex_in:
            def step(x):
                yr, _ = transform_any(x, x, n, -1)
                return yr * s
        else:
            def step(x):
                yr, _ = transform_any(x, None, n, -1)
                return yr * s
        return step

    def step_whole(n, complex_in):
        s = np.float32(1.0 / np.sqrt(n))
        p = get_whole_plan(n, -1)
        if complex_in:
            def step(x):
                yr, _ = whole_transform(x, x, p)
                return yr * s
        else:
            def step(x):
                yr, _ = whole_transform(x, None, p)
                return yr * s
        return step

    def t(step, x0):
        return chained_step_stats(step, x0, k1=30, k2=530, reps=4)

    # ── 1. Fusion inventory of the shipped dispatch (B=1 real) ──────────────
    if "inventory" not in results:
        print("== fusion inventory (shipped dispatch, B=1 real input) ==", flush=True)
        inventory = {}
        for n in (1024, 4096, 16384):
            x0 = jnp.asarray(rng.standard_normal((1, n)).astype(np.float32))
            step = step_current(n, False)
            txt = jax.jit(step).lower(x0).compile().as_text()
            fus = classify_fusions(txt)
            inventory[f"n{n}"] = fus
            print(f"n={n}: {len(fus)} fusions")
            for f in fus:
                print(f"   {f}")
        results["inventory"] = inventory
        out.write_text(json.dumps(results, indent=1))

    # ── 2. Interleaved head-to-head ─────────────────────────────────────────
    print("\n== whole-kernel vs shipped (interleaved, us/call) ==", flush=True)
    for complex_in in (False, True):
        tag = "complex" if complex_in else "real"
        for n in (1024, 2048, 4096, 8192, 16384, 32768, 65536):
            for b in (1, 2, 4, 16):
                if (tag, b, n) in done:
                    continue
                x0 = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
                s_cur = step_current(n, complex_in)
                s_new = step_whole(n, complex_in)
                # parity first
                a = np.asarray(jax.jit(s_cur)(x0))
                c = np.asarray(jax.jit(s_new)(x0))
                par = float(np.abs(a - c).max() / max(np.abs(a).max(), 1e-9))
                # interleave A/B/A/B reps
                ta1, tb1 = t(s_cur, x0), t(s_new, x0)
                ta2, tb2 = t(s_cur, x0), t(s_new, x0)
                cur = min(ta1.median_s, ta2.median_s)
                new = min(tb1.median_s, tb2.median_s)
                try:
                    nk_cur = compiled_stats(s_cur, x0)["n_kernels"]
                    nk_new = compiled_stats(s_new, x0)["n_kernels"]
                except Exception:
                    nk_cur = nk_new = -1
                row = {
                    "kind": tag, "b": b, "n": n,
                    "cur_us": cur * 1e6, "new_us": new * 1e6,
                    "speedup": cur / new, "parity": par,
                    "nk_cur": nk_cur, "nk_new": nk_new,
                }
                results["rows"].append(row)
                out.write_text(json.dumps(results, indent=1))
                print(
                    f"{tag} b={b:3d} n={n:6d}: shipped {cur*1e6:7.2f} us ({nk_cur}k) "
                    f"whole {new*1e6:7.2f} us ({nk_new}k) -> {cur/new:5.2f}x  par={par:.1e}",
                    flush=True,
                )

    out.write_text(json.dumps(results, indent=1))
    print(f"\nwrote {out}")


if __name__ == "__main__":
    main()
