"""The named 2^20 schedule levers, measured (round-5 ask 5).

Round 3 named three stage-A/B schedule variants as possible 2^20 wins and
round 4 shipped only the Mosaic-issue-rate reproducer.  This script
measures each lever through the REAL composed pipeline (monkeypatched
plan builders + cleared plan caches, so the full dispatch — half-spectrum
stage A, row-limited rows, folded stage B — is what runs):

  L1  stage-A column-tile granularity ct in {256, 512*, 1024, 2048}
      (controls the Mosaic grid pipeline's DMA/compute overlap chunk;
      the automatic grid pipeline IS double-buffered, so ct is the
      double-buffering lever that actually exists).
  L2  stage-B row-transform re-blocking (m1, m2) in {(64,128)*, (32,256),
      (128,64)} — the "K=128 -> 256" re-block ask.
  L3  manual in-kernel emit_pipeline stage A (single outer grid step per
      batch row, pltpu.emit_pipeline over column tiles) vs the automatic
      grid pipeline.

(* = shipped.)  Context row: the whole fft at 2^20 through transform_any.
Writes scripts/ablate_2e20_levers_results.json (incremental).
"""

from __future__ import annotations

import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

N = 1 << 20


def main() -> None:
    import jax
    import jax.numpy as jnp

    from gpu_fft_tpu.config import enable_compilation_cache

    enable_compilation_cache()

    import gpu_fft_tpu.kernels.large as large_mod
    import gpu_fft_tpu.plan as plan_mod
    from gpu_fft_tpu.utils.profiling import chained_step_stats

    out = pathlib.Path(__file__).with_name("ablate_2e20_levers_results.json")
    results = json.loads(out.read_text()) if out.exists() else {"rows": {}}
    rng = np.random.default_rng(7)
    x0 = jnp.asarray(rng.standard_normal((1, N)).astype(np.float32))
    s = np.float32(1.0 / np.sqrt(N))
    ref = None

    def fft_step(x):
        yr, _ = large_mod.transform_any(x, None, N, -1)
        return yr * s

    def measure(name, step, reps=3):
        nonlocal ref
        if name in results["rows"]:
            return
        got = np.asarray(jax.jit(step)(x0))
        if ref is None:
            ref = got
        par = float(np.abs(got - ref).max() / np.abs(ref).max())
        ts = [
            chained_step_stats(step, x0, k1=20, k2=220, reps=2).median_s
            for _ in range(reps)
        ]
        us = min(ts) * 1e6
        results["rows"][name] = {"us": us, "parity": par}
        out.write_text(json.dumps(results, indent=1))
        print(f"{name}: {us:8.2f} us  par={par:.1e}", flush=True)

    def clear_plans():
        plan_mod.get_stage_a_plan.cache_clear()
        plan_mod.get_stage_b_irfft_plan.cache_clear() if hasattr(
            plan_mod.get_stage_b_irfft_plan, "cache_clear"
        ) else None

    # ── L0: shipped ─────────────────────────────────────────────────────────
    measure("L0_shipped", fft_step)

    # ── L1: stage-A column tile ────────────────────────────────────────────
    orig_ct = plan_mod.stage_a_col_tile
    for ct in (256, 1024, 2048):
        plan_mod.stage_a_col_tile = lambda n1, n2, _ct=ct: min(_ct, n2)
        clear_plans()
        try:
            measure(f"L1_ct{ct}", fft_step)
        except Exception as e:
            results["rows"][f"L1_ct{ct}"] = {"error": str(e)[:200]}
            out.write_text(json.dumps(results, indent=1))
            print(f"L1_ct{ct}: ERROR {str(e)[:120]}", flush=True)
    plan_mod.stage_a_col_tile = orig_ct
    clear_plans()

    # ── L2: stage-B (m1, m2) re-block ──────────────────────────────────────
    from gpu_fft_tpu.kernels.tables import dft_matrix_ext, twiddle_table

    orig_plan = plan_mod.get_stage_a_plan.__wrapped__

    def patched_stage_a_plan(n, sign, m1m2):
        plan = dict(orig_plan(n, sign))
        n2 = plan["n2"]
        m1, m2 = m1m2
        assert m1 * m2 == n2, (m1, m2, n2)
        g1 = dft_matrix_ext(m1, sign)
        g2 = dft_matrix_ext(m2, sign)
        btwr, btwi = twiddle_table(m2, m1, n2, sign)
        plan["stage_b"] = {
            "m1": m1, "m2": m2,
            "f1r": g1[0], "f1i": g1[1], "f1s": g1[2], "f1d": g1[3],
            "f2r": g2[0], "f2i": g2[1], "f2s": g2[2], "f2d": g2[3],
            "twr": btwr, "twi": btwi,
        }
        return plan

    import functools

    for m1m2 in ((32, 256), (128, 64)):
        cache: dict = {}

        def cached(n, sign, _m=m1m2):
            if (n, sign) not in cache:
                cache[(n, sign)] = patched_stage_a_plan(n, sign, _m)
            return cache[(n, sign)]

        large_mod.get_stage_a_plan = cached
        try:
            measure(f"L2_m{m1m2[0]}x{m1m2[1]}", fft_step)
        except Exception as e:
            results["rows"][f"L2_m{m1m2[0]}x{m1m2[1]}"] = {"error": str(e)[:200]}
            out.write_text(json.dumps(results, indent=1))
            print(f"L2_m{m1m2[0]}x{m1m2[1]}: ERROR {str(e)[:120]}", flush=True)
    large_mod.get_stage_a_plan = plan_mod.get_stage_a_plan

    # ── L3: manual emit_pipeline stage A ───────────────────────────────────
    # The shipped stage A lets the Pallas GRID pipeline double-buffer the
    # column-tile DMAs automatically.  This variant drives the tiles from
    # INSIDE one kernel instance with pltpu.emit_pipeline, the explicit
    # "double-buffered emit_pipeline stage A" round-3 named.
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        from gpu_fft_tpu import config as cfg

        plan = plan_mod.get_stage_a_plan(N, -1)
        n1, n2, ct = plan["n1"], plan["n2"], plan["ct"]
        f1r, f1i = plan["f1r"], plan["f1i"]
        # Materialized twiddle for the manual variant (the factored form's
        # mask-select depends on the outer grid id; keep the variant simple
        # and charge it the full table read).
        twr, twi = twiddle_table(n1, n2, N, -1)

        def inner(x_ref, twr_ref, twi_ref, yr_ref, yi_ref, *, f1r_c, f1i_c):
            xb = x_ref[...]
            pr = jnp.dot(f1r_c, xb, precision=cfg.mosaic_precision(),
                         preferred_element_type=jnp.float32)
            pi = jnp.dot(f1i_c, xb, precision=cfg.mosaic_precision(),
                         preferred_element_type=jnp.float32)
            yr_ref[...] = pr * twr_ref[...] - pi * twi_ref[...]
            yi_ref[...] = pr * twi_ref[...] + pi * twr_ref[...]

        def outer(x_hbm, twr_hbm, twi_hbm, yr_hbm, yi_hbm, *, f1r_c, f1i_c):
            grid = (n2 // ct,)
            spec = pl.BlockSpec((n1, ct), lambda j: (0, j))
            pltpu.emit_pipeline(
                functools.partial(inner, f1r_c=f1r_c, f1i_c=f1i_c),
                grid=grid,
                in_specs=[spec, spec, spec],
                out_specs=[spec, spec],
            )(x_hbm, twr_hbm, twi_hbm, yr_hbm, yi_hbm)

        import jax as _jax

        def stage_a_manual(x):
            x3 = x.reshape(n1, n2)  # noqa: output reshaped back below
            f1r_d = jnp.asarray(f1r)
            f1i_d = jnp.asarray(f1i)

            def kernel(x_ref, twr_ref, twi_ref, f1r_ref, f1i_ref, yr_ref, yi_ref):
                outer(x_ref, twr_ref, twi_ref, yr_ref, yi_ref,
                      f1r_c=f1r_ref[...], f1i_c=f1i_ref[...])

            yr, yi = pl.pallas_call(
                kernel,
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.ANY),
                    pl.BlockSpec(memory_space=pltpu.ANY),
                    pl.BlockSpec(memory_space=pltpu.ANY),
                    pl.BlockSpec((n1, n1), lambda: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((n1, n1), lambda: (0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=[
                    pl.BlockSpec(memory_space=pltpu.ANY),
                    pl.BlockSpec(memory_space=pltpu.ANY),
                ],
                out_shape=[jax.ShapeDtypeStruct((n1, n2), jnp.float32)] * 2,
            )(x3, jnp.asarray(twr), jnp.asarray(twi), f1r_d, f1i_d)
            return yr.reshape(1, N)  # shape-stable chain carry

        # Compare stage-A ALONE: manual emit_pipeline vs shipped grid form.
        from gpu_fft_tpu.kernels.fused import stage_a as stage_a_grid

        def stage_a_shipped(x):
            x3 = x.reshape(1, n1, n2)
            yr, yi = stage_a_grid(x3, None, n1, n2, plan, ct)
            return yr.reshape(1, N)  # shape-stable chain carry

        xa = x0.reshape(1, N)
        a = np.asarray(jax.jit(stage_a_shipped)(xa))
        b = np.asarray(jax.jit(stage_a_manual)(xa))
        par = float(np.abs(a - b).max() / np.abs(a).max())
        ta = min(chained_step_stats(stage_a_shipped, xa, k1=20, k2=220, reps=2).median_s
                 for _ in range(3))
        tb = min(chained_step_stats(stage_a_manual, xa, k1=20, k2=220, reps=2).median_s
                 for _ in range(3))
        results["rows"]["L3_stageA_shipped_grid"] = {"us": ta * 1e6, "parity": 0.0}
        results["rows"]["L3_stageA_emit_pipeline"] = {"us": tb * 1e6, "parity": par}
        print(f"L3 stage-A shipped grid:   {ta*1e6:8.2f} us", flush=True)
        print(f"L3 stage-A emit_pipeline:  {tb*1e6:8.2f} us  par={par:.1e}", flush=True)
    except Exception as e:
        results["rows"]["L3_stageA_emit_pipeline"] = {"error": str(e)[:300]}
        print(f"L3 ERROR: {str(e)[:200]}", flush=True)
    out.write_text(json.dumps(results, indent=1))

    # ── L4: ct rule sweep across staged sizes (set the new tuning rule) ────
    # L1 found ct=2048 wins 13% at 2^20; before changing the RULE, measure
    # the ct grid across the staged-size range, forward AND the staged
    # real-output inverse (both ride stage A).
    from gpu_fft_tpu.ops.transform import irfft_device

    orig_ct2 = plan_mod.stage_a_col_tile
    for nn in (1 << 17, 1 << 18, 1 << 20, 1 << 22):
        xs = jnp.asarray(rng.standard_normal((1, nn)).astype(np.float32))
        ss = np.float32(1.0 / np.sqrt(nn))

        def ffts(x, _n=nn, _s=ss):
            yr, _ = large_mod.transform_any(x, None, _n, -1)
            return yr * _s

        h = nn // 2 + 1

        def irffts(x, _n=nn, _h=h, _s=ss):
            z = x[..., :_h]
            return irfft_device(z, z * np.float32(0.5)) * _s

        for ct in (512, 1024, 2048):
            key = f"L4_fft_n{nn}_ct{ct}"
            key2 = f"L4_irfft_n{nn}_ct{ct}"
            if key in results["rows"] and key2 in results["rows"]:
                continue
            plan_mod.stage_a_col_tile = lambda a, b_, _ct=ct: min(_ct, b_)
            clear_plans()
            for kk, stepf in ((key, ffts), (key2, irffts)):
                if kk in results["rows"]:
                    continue
                try:
                    ts = [
                        chained_step_stats(stepf, xs, k1=20, k2=220, reps=2).median_s
                        for _ in range(2)
                    ]
                    results["rows"][kk] = {"us": min(ts) * 1e6}
                    print(f"{kk}: {min(ts)*1e6:8.2f} us", flush=True)
                except Exception as e:
                    results["rows"][kk] = {"error": str(e)[:200]}
                    print(f"{kk}: ERROR {str(e)[:120]}", flush=True)
                out.write_text(json.dumps(results, indent=1))
    plan_mod.stage_a_col_tile = orig_ct2
    clear_plans()
    out.write_text(json.dumps(results, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
