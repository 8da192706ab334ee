"""Calibrate the roofline's MXU model against bare matmuls on this chip.

Round 2's roofline assumed every f32 matmul costs a nominal 6 bf16 MXU
passes under ``Precision.HIGHEST`` — and promptly read 115% of
speed-of-light on one config, i.e. XLA's lowering beats the nominal pass
count for some shapes.  An instrument that overshoots 100% cannot certify
the >=80% north star (round-2 verdict item 2), so this script MEASURES the
effective pass count per contraction class:

    eff_passes(K) = measured_time(bare z @ W chain) * bf16_peak / (2*M*K*N)

for K in the contraction sizes the transform plans actually use (32..512),
with M*K = 2^20 elements per operand (the headline working-set scale).  The
bare matmul IS the speed-of-light reference for a matmul-factored FFT: no
algorithm on this chip can run its dot products faster than a lone dot.

Output: a ready-to-paste ``EFF_PASSES`` entry for utils/roofline.py plus
per-class dispersion (the instrument's error bars, quoted in the bench
report).  Run on real hardware:  python scripts/calibrate_matmul.py
"""

from __future__ import annotations

import json
import sys

import numpy as np

CONTRACTIONS = (32, 64, 128, 256, 512)
ELEMENTS = 1 << 20  # M*K per operand: the headline working-set scale


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from gpu_fft_tpu.config import enable_compilation_cache
    from gpu_fft_tpu.utils.profiling import chained_step_stats
    from gpu_fft_tpu.utils.roofline import detect_chip

    enable_compilation_cache()
    chip = detect_chip()
    peak = chip.bf16_tflops * 1e12
    print(f"[calibrate] chip={chip.name} bf16 peak {chip.bf16_tflops} TFLOP/s",
          file=sys.stderr, flush=True)

    rng = np.random.default_rng(11)
    out: dict = {}
    for k in CONTRACTIONS:
        m = ELEMENTS // k
        # MARGINAL dot cost: time chains with d1 and d2 = 3*d1 dots per loop
        # step and difference them.  This cancels BOTH the chain's loop-carry
        # overhead and the per-step boundary traffic — an in-context composed
        # graph pays neither, and an instrument built from a contaminated
        # bare chain reads >100% on well-scheduled configs (round-2's 115%
        # row reproduced with chained single dots at nominal-6 AND at naive
        # chained-eff calibration).
        d1 = max(2, 1024 // k)
        d2 = 3 * d1
        ws = [jnp.asarray(rng.standard_normal((k, k)).astype(np.float32) * (0.5 / k))
              for _ in range(4)]
        x0 = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))

        def make_step(d):
            def step(z):
                y = z
                for i in range(d):
                    y = jnp.dot(y, ws[i % len(ws)], precision=lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32)
                # Renormalize so the chain neither explodes nor denormals out.
                return y * jnp.float32(1e-3) + z * jnp.float32(0.5)

            return step

        s1 = chained_step_stats(make_step(d1), x0, k1=5, k2=55, reps=5)
        s2 = chained_step_stats(make_step(d2), x0, k1=5, k2=55, reps=5)
        marginal_s = (s2.median_s - s1.median_s) / (d2 - d1)
        flops = 2.0 * m * k * k
        eff = marginal_s * peak / flops
        spread = max(s1.iqr_s / s1.median_s, s2.iqr_s / s2.median_s)
        out[k] = {"eff_passes": round(eff, 3), "rel_iqr": round(spread, 4),
                  "marginal_us": round(marginal_s * 1e6, 4), "m": m,
                  "d1": d1, "d2": d2}
        print(f"[calibrate] K={k:4d} M={m:7d} d={d1}->{d2}: marginal "
              f"{marginal_s * 1e6:7.3f} us/dot -> eff_passes={eff:6.3f} "
              f"(rel iqr {spread:.1%})",
              file=sys.stderr, flush=True)

    # ── Pattern calibration: the plan's dots are not lone square dots ──────
    # Real stages run PAIRS sharing one operand (x @ F1r, x @ F1i); complex
    # stages run KARATSUBA TRIPLES ((a+b) @ W1, a @ W2, b @ W3 + combines).
    # XLA schedules shared-operand groups cheaper per flop than isolated
    # dots (operand reuse across the HIGHEST pass decomposition), so the
    # roofline uses per-(K, pattern) effective passes.
    patterns: dict = {}
    for k in (128, 256):
        m = ELEMENTS // k
        ws = [jnp.asarray(rng.standard_normal((k, k)).astype(np.float32) * (0.5 / k))
              for _ in range(3)]
        x0 = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))

        def pair(z, ws=ws):
            a = jnp.dot(z, ws[0], precision=lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
            bq = jnp.dot(z, ws[1], precision=lax.Precision.HIGHEST,
                         preferred_element_type=jnp.float32)
            return a * jnp.float32(0.5) + bq * jnp.float32(0.5)

        def triple(z, ws=ws):
            a = z
            bq = z * jnp.float32(0.5)
            k1 = jnp.dot(a + bq, ws[0], precision=lax.Precision.HIGHEST,
                         preferred_element_type=jnp.float32)
            k2 = jnp.dot(a, ws[1], precision=lax.Precision.HIGHEST,
                         preferred_element_type=jnp.float32)
            k3 = jnp.dot(bq, ws[2], precision=lax.Precision.HIGHEST,
                         preferred_element_type=jnp.float32)
            return (k1 - k3) * jnp.float32(0.5) + (k1 + k2) * jnp.float32(0.5)

        for name, fn, d in (("pair", pair, 2), ("triple", triple, 3)):
            s = chained_step_stats(fn, x0, k1=10, k2=110, reps=5)
            flops = 2.0 * m * k * k * d
            eff = s.median_s * peak / flops
            patterns[f"{name}_k{k}"] = round(eff, 3)
            print(f"[calibrate] {name:6s} K={k}: {s.median_s * 1e6:8.2f} us "
                  f"-> eff_passes={eff:6.3f}", file=sys.stderr, flush=True)

    entry = {str(k): v["eff_passes"] for k, v in out.items()}
    bars = max(v["rel_iqr"] for v in out.values())
    print(json.dumps({"chip": chip.name, "eff_passes": entry,
                      "patterns": patterns,
                      "max_rel_iqr": round(bars, 4), "detail": out}, indent=2))
    print(f"\n# paste into utils/roofline.py EFF_PASSES:\n"
          f'    "{chip.name}": {{{", ".join(f"{k}: {v["eff_passes"]}" for k, v in out.items())}}},'
          f"\n# patterns: {patterns}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
