"""Floor audit for the fused-size real-output inverse (round-4 ask 8).

irfft_n65536 benched at 41% SoL vs fft_n65536's 58% (BENCH_r03).  Suspects:

* stage 1 contracts with h1 = n1/2 + 1 = 129 kept grid columns on the
  LANE axis of its (b, n2, h1) input — 129 lanes pads to 256, potentially
  doubling the stage-1 dot;
* the "bck,cm->bkm" orientation contracts the SUBLANE axis, which may
  force a relayout of the (b, c, k) input.

Variants measured (chained harness, real TPU):
  A  fused_irfft_jnp as shipped (full Hermitian input)
  B  Nyquist-split: stage-1 dot on exactly 128 kept columns (one lane
     tile) + a separate (b, c) @ (c, m) vector dot for the k1 = n1/2
     column
  C  B with the stage-1 einsum re-oriented "bkc,cm->bkm" (pre-swapaxes)
  D  one-sided entry fused_irfft_half_jnp (API path: grid built from
     h bins, no full mirror) vs the OLD mirror+fold path
"""

from __future__ import annotations

import numpy as np


def main() -> None:
    import jax.numpy as jnp

    from gpu_fft_tpu.kernels.fused_jnp import (
        KARATSUBA,
        _prec,
        fused_irfft_half_jnp,
        fused_irfft_jnp,
    )
    from gpu_fft_tpu.plan import get_irfft_plan
    from gpu_fft_tpu.utils.profiling import chained_step_stats

    rng = np.random.default_rng(0)

    def time_step(step, x0, label):
        s = chained_step_stats(step, x0, k1=20, k2=220, reps=4)
        print(f"  {label}: {s.median_s * 1e6:.2f} us (iqr {s.iqr_s * 1e6:.2f})")
        return s.median_s

    def cm(eq, ar, ai, plan, prefix):
        if KARATSUBA:
            k1 = jnp.einsum(eq, ar + ai, plan[prefix + "r"], precision=_prec())
            k2 = jnp.einsum(eq, ar, plan[prefix + "d"], precision=_prec())
            k3 = jnp.einsum(eq, ai, plan[prefix + "s"], precision=_prec())
            return k1 - k3, k1 + k2
        pr = jnp.einsum(eq, ar, plan[prefix + "r"], precision=_prec())
        pi = jnp.einsum(eq, ai, plan[prefix + "i"], precision=_prec())
        qr = jnp.einsum(eq, ar, plan[prefix + "i"], precision=_prec())
        qi = jnp.einsum(eq, ai, plan[prefix + "r"], precision=_prec())
        return pr - pi, qr + qi

    def nyq_split(xr, xi, plan, orient_k_rows: bool):
        b = xr.shape[0]
        n1, n2, h1 = plan["n1"], plan["n2"], plan["h1"]
        n = n1 * n2
        half = n1 // 2
        g3r = xr.reshape(b, n2, n1)
        g3i = xi.reshape(b, n2, n1)
        gr, gi = g3r[:, :, :half], g3i[:, :, :half]  # one full lane tile
        if orient_k_rows:
            gr = jnp.swapaxes(gr, 1, 2)
            gi = jnp.swapaxes(gi, 1, 2)
            gr_m, gi_m = cm("bkc,cm->bkm", gr, gi, plan, "g2")
        else:
            gr_m, gi_m = cm("bck,cm->bkm", gr, gi, plan, "g2")
        # Nyquist grid column: one (b, c) @ (c, m) vector dot.
        nr, ni = cm("bc,cm->bm", g3r[:, :, half], g3i[:, :, half], plan, "g2")
        twr, twi = plan["twr"], plan["twi"]
        zr = gr_m * twr[None, :half] - gi_m * twi[None, :half]
        zi = gr_m * twi[None, :half] + gi_m * twr[None, :half]
        z_nyq_r = nr * twr[None, half] - ni * twi[None, half]
        out = jnp.einsum("bkm,kM->bMm", zr, plan["w1r"], precision=_prec()) - jnp.einsum(
            "bkm,kM->bMm", zi, plan["w1i"], precision=_prec()
        )
        out = out + plan["alt"][None, :, None] * z_nyq_r[:, None, :]
        return out.reshape(b, n)

    for n in (1 << 15, 1 << 16):
        print(f"n={n}:")
        plan = get_irfft_plan(n, scale=1.0 / n)
        x = rng.standard_normal((1, n)).astype(np.float32)
        sp = np.fft.rfft(x.astype(np.float64))
        full = np.fft.fft(x.astype(np.float64))
        fr = jnp.asarray(full.real.astype(np.float32))
        fi = jnp.asarray(full.imag.astype(np.float32))
        hr = jnp.asarray(sp.real.astype(np.float32))
        hi = jnp.asarray(sp.imag.astype(np.float32))

        # correctness first
        ya = np.asarray(fused_irfft_jnp(fr, fi, plan))
        yb = np.asarray(nyq_split(fr, fi, plan, False))
        yc = np.asarray(nyq_split(fr, fi, plan, True))
        for lbl, y in (("B", yb), ("C", yc)):
            err = np.abs(y - ya).max()
            assert err < 1e-5, (lbl, err)
            print(f"  variant {lbl} matches A to {err:.1e}")

        s = np.float32(np.sqrt(n / 2.0))
        time_step(lambda z: fused_irfft_jnp(z, z, plan) * s, fr, "A full-input fold (shipped)")
        time_step(lambda z: nyq_split(z, z, plan, False) * s, fr, "B nyquist-split bck")
        time_step(lambda z: nyq_split(z, z, plan, True) * s, fr, "C nyquist-split bkc")

        # D: API one-sided path, old mirror form vs new direct grid
        from gpu_fft_tpu.kernels.large import inverse_real_half

        sh = np.float32(np.sqrt(n))

        def old_mirror(zr):
            from jax import lax

            h = n // 2 + 1
            half2 = n // 2
            b = zr.shape[0]
            rows = max(half2 // 128, 1)

            def rev_half(a):
                return lax.rev(a[..., :half2].reshape(b, rows, -1), (1, 2)).reshape(b, half2)

            full_r = jnp.concatenate([zr, rev_half(zr)[..., : half2 - 1]], axis=-1)
            full_i = jnp.concatenate([zr, -rev_half(zr)[..., : half2 - 1]], axis=-1)
            return fused_irfft_jnp(full_r, full_i, plan)[..., : n // 2 + 1] * sh

        time_step(old_mirror, hr, "D0 one-sided via full mirror (old)")
        time_step(
            lambda z: fused_irfft_half_jnp(z, z, plan)[..., : n // 2 + 1] * sh,
            hr,
            "D1 one-sided direct grid (new)",
        )


if __name__ == "__main__":
    main()


def variant_fused_stage2(xr, xi, plan):
    """One-einsum stage 2: z_cat = [zr rows 0..n1/2 ; zi rows 1..n1/2-1]
    against the combined (n1, n1) table W = [c*cos rows (incl. the
    (-1)^M Nyquist row) ; -c*sin rows 1..n1/2-1] — the zi DC row's weight
    column is identically zero (sin 0) and the Nyquist imaginary part has
    a real stage-2 factor, so both drop exactly.  Same MACs as the two
    half-contraction einsums + rank-1 broadcast, but ONE full-tile dot."""
    import jax.numpy as jnp
    import numpy as np

    from gpu_fft_tpu.kernels.fused_jnp import KARATSUBA, _prec

    b = xr.shape[0]
    n1, n2, h1 = plan["n1"], plan["n2"], plan["h1"]
    n = n1 * n2
    gr = xr.reshape(b, n2, n1)[:, :, :h1]
    gi = xi.reshape(b, n2, n1)[:, :, :h1]

    def cm(eq, ar, ai, prefix):
        if KARATSUBA:
            k1 = jnp.einsum(eq, ar + ai, plan[prefix + "r"], precision=_prec())
            k2 = jnp.einsum(eq, ar, plan[prefix + "d"], precision=_prec())
            k3 = jnp.einsum(eq, ai, plan[prefix + "s"], precision=_prec())
            return k1 - k3, k1 + k2
        pr = jnp.einsum(eq, ar, plan[prefix + "r"], precision=_prec())
        pi = jnp.einsum(eq, ai, plan[prefix + "i"], precision=_prec())
        qr = jnp.einsum(eq, ar, plan[prefix + "i"], precision=_prec())
        qi = jnp.einsum(eq, ai, plan[prefix + "r"], precision=_prec())
        return pr - pi, qr + qi

    gr_m, gi_m = cm("bck,cm->bkm", gr, gi, "g2")
    twr = plan["twr"][None]
    twi = plan["twi"][None]
    zr = gr_m * twr - gi_m * twi
    zi = gr_m * twi + gi_m * twr
    z_cat = jnp.concatenate([zr, zi[:, 1 : n1 // 2]], axis=1)  # (b, n1, n2)
    # combined table from the plan pieces (would live in the plan if shipped)
    w1r, w1i, alt = plan["w1r"], plan["w1i"], plan["alt"]
    w_cat = np.concatenate([np.asarray(w1r), np.asarray(alt)[None, :], -np.asarray(w1i)[1:]], axis=0)
    out = jnp.einsum("bkm,kM->bMm", z_cat, jnp.asarray(w_cat), precision=_prec())
    return out.reshape(b, n)


def main2() -> None:
    import jax.numpy as jnp

    from gpu_fft_tpu.kernels.fused_jnp import fused_irfft_jnp
    from gpu_fft_tpu.plan import get_irfft_plan
    from gpu_fft_tpu.utils.profiling import chained_step_stats

    rng = np.random.default_rng(0)
    for n in (1 << 15, 1 << 16):
        print(f"n={n}:")
        plan = get_irfft_plan(n, scale=1.0 / n)
        x = rng.standard_normal((1, n)).astype(np.float32)
        full = np.fft.fft(x.astype(np.float64))
        fr = jnp.asarray(full.real.astype(np.float32))
        fi = jnp.asarray(full.imag.astype(np.float32))
        ya = np.asarray(fused_irfft_jnp(fr, fi, plan))
        ye = np.asarray(variant_fused_stage2(fr, fi, plan))
        err = np.abs(ye - ya).max()
        print(f"  E one-einsum stage2 matches A to {err:.1e}")
        assert err < 1e-5

        s = np.float32(np.sqrt(n / 2.0))
        for lbl, f in (
            ("A shipped", lambda z: fused_irfft_jnp(z, z, plan) * s),
            ("E one-einsum stage2", lambda z: variant_fused_stage2(z, z, plan) * s),
        ):
            st = chained_step_stats(f, fr, k1=20, k2=220, reps=4)
            print(f"  {lbl}: {st.median_s * 1e6:.2f} us (iqr {st.iqr_s * 1e6:.2f})")


if __name__ == "__main__":
    pass
