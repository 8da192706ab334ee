"""Re-derive the per-chip tuning table entry on the CURRENT hardware.

Runs the measured ablations that set every ``gpu_fft_tpu.tuning.ChipTuning``
field — the wide-split crossover, the folded-layout predicate, the stage-A
digit, and the overlap-add block floor — and prints a ready-to-paste
``ChipTuning`` entry plus the per-decision evidence.  This is the promotion
path for the uncalibrated (transferred) v5p/v6e/v4 rows: run it once on a
new chip generation, paste the entry, flip ``calibrated=True``.

Usage:  python scripts/calibrate_chip.py [--quick]
  --quick   3 reps instead of 5 and a reduced size grid (smoke mode).

The individual ablation harnesses (scripts/ablate_*.py) remain the full
evidence generators; this driver runs the subset that maps one-to-one onto
table fields, interleaved on-device like the originals.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    reps = 3 if args.quick else 5

    import jax.numpy as jnp

    from gpu_fft_tpu.config import enable_compilation_cache
    from gpu_fft_tpu.utils.roofline import detect_chip

    enable_compilation_cache()
    chip = detect_chip()
    print(f"[calibrate] chip = {chip.name} "
          f"(hbm {chip.hbm_gbps} GB/s, {chip.bf16_tflops} bf16 TFLOP/s)")

    from gpu_fft_tpu.kernels.fused_jnp import fused_fft_jnp_folded
    from gpu_fft_tpu.plan import get_fused_plan
    from gpu_fft_tpu.utils.profiling import chained_step_stats

    rng = np.random.default_rng(7)

    def time_step(step, x0, k1=20, k2=220):
        return chained_step_stats(step, x0, k1=k1, k2=k2, reps=reps).median_s

    def fused_step(n, wide):
        plan = get_fused_plan(n, -1, wide=wide)

        def step(x):
            yr, yi = fused_fft_jnp_folded(x, None, plan)
            return yr * jnp.float32(1e-6) + x * jnp.float32(0.9)

        return step

    # ── wide_batch_min / wide_n range: balanced vs n2=128 split ────────────
    print("[calibrate] wide-split crossover (balanced vs full-lane n2=128):")
    wide_wins: dict = {}
    bs = (4, 16, 64) if args.quick else (4, 8, 16, 32, 64)
    ns = (1024, 4096, 16384) if args.quick else (256, 1024, 4096, 16384)
    for n in ns:
        for b in bs:
            x = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
            t_bal = time_step(fused_step(n, wide=False), x)
            t_wide = time_step(fused_step(n, wide=True), x)
            wide_wins[(b, n)] = t_wide < t_bal
            print(f"  b={b:3d} n={n:6d}: balanced {t_bal*1e6:7.2f} us  "
                  f"wide {t_wide*1e6:7.2f} us  -> {'wide' if t_wide < t_bal else 'balanced'}")
    wide_bs = sorted({b for (b, n), w in wide_wins.items() if w})
    wide_batch_min = wide_bs[0] if wide_bs else 10**9

    # ── stage_a_n1: column digit sweep at a staged size ────────────────────
    from gpu_fft_tpu import plan as plan_mod
    from gpu_fft_tpu.kernels.large import transform_any

    n_staged = 1 << 18 if args.quick else 1 << 20
    print(f"[calibrate] stage-A digit at n=2^{n_staged.bit_length() - 1}:")
    best_digit, best_t = None, float("inf")
    for digit in (128, 256):
        plan_mod.get_stage_a_plan.cache_clear()
        orig = plan_mod._stage_a_n1
        plan_mod._stage_a_n1 = lambda n, d=digit: d  # type: ignore[assignment]
        try:
            x = jnp.asarray(rng.standard_normal((1, n_staged)).astype(np.float32))

            def step(v):
                yr, yi = transform_any(v, None, n_staged, -1)
                return yr * jnp.float32(1e-6) + v * jnp.float32(0.9)

            t = time_step(step, x)
            print(f"  n1={digit}: {t*1e6:.2f} us")
            if t < best_t:
                best_digit, best_t = digit, t
        finally:
            plan_mod._stage_a_n1 = orig
            plan_mod.get_stage_a_plan.cache_clear()

    # ── oa_block_min: overlap-add block floor ──────────────────────────────
    from gpu_fft_tpu.ops.filter import firwin, oaconvolve_device

    print("[calibrate] overlap-add block floor (262144-sample signal, 257 taps):")
    sig = jnp.asarray(rng.standard_normal((1, 1 << 18)).astype(np.float32))
    taps = jnp.asarray(firwin(257, 0.3))
    best_blk, best_bt = None, float("inf")
    for blk in (4096, 8192, 16384, 32768):

        def oas(v, blk=blk):
            return oaconvolve_device(v, taps, block=blk)[:, : v.shape[1]]

        t = time_step(oas, sig)
        print(f"  block={blk}: {t*1e6:.2f} us")
        if t < best_bt:
            best_blk, best_bt = blk, t

    # ── half_spectrum_min: smallest n where the Hermitian half path wins ───
    from gpu_fft_tpu.kernels.fused_jnp import fused_fft_jnp, fused_fft_jnp_half

    print("[calibrate] half-spectrum gate (real input, B=1, transpose form):")
    half_min = 1 << 62
    for n in ((1 << 14, 1 << 15) if args.quick else (1 << 13, 1 << 14, 1 << 15, 1 << 16)):
        plan = get_fused_plan(n, -1, wide=False)
        x = jnp.asarray(rng.standard_normal((1, n)).astype(np.float32))

        def full_step(v, plan=plan):
            yr, yi = fused_fft_jnp(v, None, plan)
            return yr * jnp.float32(1e-6) + v * jnp.float32(0.9)

        def half_step(v, plan=plan):
            yr, yi = fused_fft_jnp_half(v, plan)
            return yr * jnp.float32(1e-6) + v * jnp.float32(0.9)

        t_full = time_step(full_step, x)
        t_half = time_step(half_step, x)
        win = t_half < t_full
        print(f"  n={n:6d}: full {t_full*1e6:7.2f} us  half {t_half*1e6:7.2f} us"
              f"  -> {'half' if win else 'full'}")
        if win:
            half_min = min(half_min, n)

    # ── irfft_half_min: smallest n where the real-output inverse fold wins ─
    from gpu_fft_tpu.kernels.fused_jnp import fused_irfft_jnp
    from gpu_fft_tpu.kernels.large import transform_any
    from gpu_fft_tpu.plan import get_irfft_plan

    print("[calibrate] irfft fold gate (real output, B=1):")
    irfft_min = 1 << 62
    for n in ((1 << 14, 1 << 15) if args.quick else (1 << 13, 1 << 14, 1 << 15, 1 << 16)):
        iplan = get_irfft_plan(n, scale=1.0 / n)
        x = jnp.asarray(rng.standard_normal((1, n)).astype(np.float32))

        def full_inv_step(v, n=n):
            yr, _ = transform_any(v, v, n, +1, scale=1.0 / n)
            return yr * jnp.float32(1e-3) + v * jnp.float32(0.9)

        def fold_step(v, iplan=iplan):
            return fused_irfft_jnp(v, v, iplan) * jnp.float32(1e-3) + v * jnp.float32(0.9)

        t_full = time_step(full_inv_step, x)
        t_fold = time_step(fold_step, x)
        win = t_fold < t_full
        print(f"  n={n:6d}: full {t_full*1e6:7.2f} us  fold {t_fold*1e6:7.2f} us"
              f"  -> {'fold' if win else 'full'}")
        if win:
            irfft_min = min(irfft_min, n)
    # The staged gate needs the 2^17-2^18 head-to-head
    # (scripts/ablate_irfft_half.py staged); keep the v5e transfer here and
    # flag it in the note.
    print("\n[calibrate] paste into gpu_fft_tpu/tuning.py TUNING:")
    print(f"""    "{chip.name}": ChipTuning(
        name="{chip.name}",
        wide_batch_min={wide_batch_min},
        wide_n_min=256,
        wide_n_max=16384,
        folded_n_max=16384,
        folded_batch_min=2,
        stage_a_n1={best_digit},
        oa_block_min={best_blk},
        rfft_pack_min=1 << 62,
        half_spectrum_min={half_min},
        irfft_half_min={irfft_min},
        irfft_half_staged_min=1 << 18,  # v5e transfer; re-run ablate_irfft_half.py staged
        calibrated=True,
        note="measured by scripts/calibrate_chip.py",
    ),""")
    print("[calibrate] NOTE: folded/wide n-ranges above keep the v5e bounds; "
          "run scripts/ablate_fused_folded.py for the full per-(B, n) map. "
          "rfft_pack_min stays disabled by default — scripts/ablate_rfft_pack.py "
          "is its dedicated harness (it lost at every (B, n) on v5e).")


if __name__ == "__main__":
    sys.exit(main())
