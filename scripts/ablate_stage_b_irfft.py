"""Stage-B irfft fold layout variants (the staged real-output inverse).

The first cut (folded 'bMmK' output order) measured BREAK-EVEN with the
full complex stage B at 2^17-2^18 despite half the FLOPs — the same trap
docs/ABLATION.md §13 hit on the forward half path, where the folded output
order padded the halved axis back to full lane tiles.  §13's fix was the
einsum's NATIVE output order plus one explicit half-sized transpose; this
script measures the same family for the inverse fold:

  v1  folded 'bMmK' (zero transposes — the shipped first cut)
  v2  native 'bKmM' stage 2 + one explicit (0,3,2,1) transpose of the REAL
      output (half the bytes of a complex relayout)
  v3  v2 with stage 1 fed a pre-transposed [b,K,q,p] view (contraction on
      the minor axis)
  ship  full complex stage B (stage_b_jnp) + drop imag — the baseline

All variants share the SAME Pallas stage A (included in the timing), so
differences isolate stage B.  Accuracy vs numpy f64 irfft.

Run on TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/ablate_stage_b_irfft.py
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from gpu_fft_tpu.config import KARATSUBA, enable_compilation_cache
    from gpu_fft_tpu.kernels.fused import stage_a
    from gpu_fft_tpu.kernels.fused_jnp import _prec, stage_b_jnp
    from gpu_fft_tpu.plan import get_stage_a_plan, get_stage_b_irfft_plan
    from gpu_fft_tpu.utils.profiling import chained_step_stats

    enable_compilation_cache()
    rng = np.random.default_rng(0)

    def cm(eq, ar, ai, t, prefix):
        if KARATSUBA:
            k1 = jnp.einsum(eq, ar + ai, t[prefix + "r"], precision=_prec())
            k2 = jnp.einsum(eq, ar, t[prefix + "d"], precision=_prec())
            k3 = jnp.einsum(eq, ai, t[prefix + "s"], precision=_prec())
            return k1 - k3, k1 + k2
        pr = jnp.einsum(eq, ar, t[prefix + "r"], precision=_prec())
        pi = jnp.einsum(eq, ai, t[prefix + "i"], precision=_prec())
        qr = jnp.einsum(eq, ar, t[prefix + "i"], precision=_prec())
        qi = jnp.einsum(eq, ai, t[prefix + "r"], precision=_prec())
        return pr - pi, qr + qi

    def run_stage_a(xr, xi, n, plan):
        b = xr.shape[0]
        n1, n2 = plan["n1"], plan["n2"]
        return stage_a(
            xr.reshape(b, n1, n2), xi.reshape(b, n1, n2), n1, n2, plan, plan["ct"]
        )

    def fold_common(yr, yi, n1, t, pre_t: bool):
        b = yr.shape[0]
        Q, P, h = t["n1"], t["n2"], t["h1"]
        gr = yr.reshape(b, n1, P, Q)[..., :h]
        gi = yi.reshape(b, n1, P, Q)[..., :h]
        if pre_t:
            gr = jnp.swapaxes(gr, 2, 3)  # [b, K, q, p]
            gi = jnp.swapaxes(gi, 2, 3)
            gr_m, gi_m = cm("bKqp,pm->bKqm", gr, gi, t, "g2")
        else:
            gr_m, gi_m = cm("bKpq,pm->bKqm", gr, gi, t, "g2")
        twr = t["twr"][None, None]
        twi = t["twi"][None, None]
        zr = gr_m * twr - gi_m * twi
        zi = gr_m * twi + gi_m * twr
        return zr, zi, Q, P

    def v1(yr, yi, n1, t):
        zr, zi, Q, P = fold_common(yr, yi, n1, t, pre_t=False)
        half = Q // 2
        out = jnp.einsum(
            "bKqm,qM->bMmK", zr[:, :, :half, :], t["w1r"], precision=_prec()
        ) - jnp.einsum("bKqm,qM->bMmK", zi[:, :, :half, :], t["w1i"], precision=_prec())
        nyq = jnp.transpose(zr[:, :, half, :], (0, 2, 1))
        out = out + t["alt"][None, :, None, None] * nyq[:, None, :, :]
        return out.reshape(yr.shape[0], n1 * P * Q)

    def v_native(yr, yi, n1, t, pre_t):
        zr, zi, Q, P = fold_common(yr, yi, n1, t, pre_t=pre_t)
        half = Q // 2
        out = jnp.einsum(
            "bKqm,qM->bKmM", zr[:, :, :half, :], t["w1r"], precision=_prec()
        ) - jnp.einsum("bKqm,qM->bKmM", zi[:, :, :half, :], t["w1i"], precision=_prec())
        out = out + t["alt"][None, None, None, :] * zr[:, :, half, :][:, :, :, None]
        # (b, K, m, M) -> (b, M, m, K): one real relayout.
        return jnp.transpose(out, (0, 3, 2, 1)).reshape(yr.shape[0], n1 * P * Q)

    def v2(yr, yi, n1, t):
        return v_native(yr, yi, n1, t, pre_t=False)

    def v3(yr, yi, n1, t):
        return v_native(yr, yi, n1, t, pre_t=True)

    for b, n in [(1, 1 << 18), (1, 1 << 20), (4, 1 << 18)]:
        x = rng.standard_normal((b, n)).astype(np.float32)
        X = np.fft.fft(x.astype(np.float64), axis=-1)
        xr = jnp.asarray(X.real.astype(np.float32))
        xi = jnp.asarray(X.imag.astype(np.float32))
        plan = get_stage_a_plan(n, +1)
        bt = get_stage_b_irfft_plan(n, scale=1.0 / n)
        n1 = plan["n1"]
        s = jnp.float32(1.0 / n)

        variants = {
            "v1-folded": lambda r, i: v1(*run_stage_a(r, i, n, plan), n1, bt),
            "v2-native": lambda r, i: v2(*run_stage_a(r, i, n, plan), n1, bt),
            "v3-pre-t": lambda r, i: v3(*run_stage_a(r, i, n, plan), n1, bt),
            "ship-full": lambda r, i: stage_b_jnp(
                *run_stage_a(r, i, n, plan), plan["n1"], plan["n2"], plan["stage_b"]
            )[0]
            * s,
        }

        z0 = jnp.stack([xr, xi])
        rows = []
        for name, fn in variants.items():
            out = np.asarray(jax.jit(fn)(xr, xi))
            err = np.abs(out - x).max() / np.abs(x).max()
            bound = 5 * np.log2(n) * np.finfo(np.float32).eps

            def step(z, fn=fn):
                y = fn(z[0], z[1])
                return z * jnp.float32(0.5) + y[None] * jnp.float32(1e-3)

            st = chained_step_stats(step, z0, k1=5, k2=55, reps=5)
            rows.append((name, st.median_s * 1e6, st.iqr_s * 1e6, err, err < bound))
            print(
                f"B={b} n=2^{int(np.log2(n))} {name:10s}: "
                f"{st.median_s*1e6:8.2f} us (iqr {st.iqr_s*1e6:5.2f}) err={err:.2e} "
                f"{'OK' if err < bound else 'FAIL'}",
                flush=True,
            )
        best = min(rows, key=lambda r: r[1])
        print(f"  -> best: {best[0]}", flush=True)


if __name__ == "__main__":
    main()
