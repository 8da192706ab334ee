"""irfft fused-size floor audit, round 2: combined variants (ask 8).

Compiled-HLO evidence (round 4): the shipped fold's stage-1 Karatsuba
dots materialize as f32[256,129] — the 129 kept k1 columns ride the LANE
axis and pad to 256, so stage 1 pays the FULL inverse's dot cost and the
fold's modeled stage-1 halving never happens.  The 16-fusion module also
carries a ~1.6 us launch floor (0.35 + 0.078 * 16).

Variants (all oracle-checked against the shipped form):
  A  shipped fused_irfft_jnp
  F  stage 1 on exactly 128 kept columns (lane-exact dots) + the Nyquist
     grid column as a 2-real-dot direct transform + ONE stage-2 einsum
     whose 256-row z_cat absorbs the zi rows AND the Nyquist row
  G  like F but keeping the shipped 2-einsum + rank-1 stage 2
"""

from __future__ import annotations

import numpy as np


def build_tables(plan):
    """Host-side extras for F/G: the Nyquist-column direct tables and the
    combined stage-2 matrix."""
    n1, n2, h1 = plan["n1"], plan["n2"], plan["h1"]
    n = n1 * n2
    half = n1 // 2
    # v[m] = Re( tw[half, m] * sum_c X[half + n1*c] w_{n2}^{+mc} )
    #      = sum_c xr_c * A[c, m] - xi_c * B[c, m]
    c_idx = np.arange(n2, dtype=np.int64)
    m_idx = np.arange(n2, dtype=np.int64)
    red = np.mod(np.outer(c_idx, m_idx), n2).astype(np.float64)
    w = np.exp(2j * np.pi * red / n2)  # w_{n2}^{+mc}
    tw = np.asarray(plan["twr"][half], dtype=np.float64) + 1j * np.asarray(
        plan["twi"][half], dtype=np.float64
    )
    A = (w * tw[None, :]).real.astype(np.float32)
    B = -(w * tw[None, :]).imag.astype(np.float32)
    # combined stage-2 table: rows [w1r k=0..half-1 | alt (nyquist) | -w1i k=1..half-1]
    w1r, w1i, alt = np.asarray(plan["w1r"]), np.asarray(plan["w1i"]), np.asarray(plan["alt"])
    w_cat = np.concatenate([w1r, alt[None, :], -w1i[1:]], axis=0)  # (n1, n1)
    return {"A": A, "B": B, "w_cat": w_cat}


def variant_fg(xr, xi, plan, extra, one_einsum: bool):
    import jax.numpy as jnp

    from gpu_fft_tpu.kernels.fused_jnp import KARATSUBA, _prec

    b = xr.shape[0]
    n1, n2 = plan["n1"], plan["n2"]
    n = n1 * n2
    half = n1 // 2
    g3r = xr.reshape(b, n2, n1)
    g3i = xi.reshape(b, n2, n1)
    gr, gi = g3r[:, :, :half], g3i[:, :, :half]

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

    gr_m, gi_m = cm("bck,cm->bkm", gr, gi, "g2")  # (b, half, n2), lane-exact
    twr = plan["twr"][None, :half]
    twi = plan["twi"][None, :half]
    zr = gr_m * twr - gi_m * twi
    zi = gr_m * twi + gi_m * twr
    # Nyquist column: v[m] via two real vector dots (lane-exact, tiny).
    v = jnp.einsum("bc,cm->bm", g3r[:, :, half], extra["A"], precision=_prec()) + jnp.einsum(
        "bc,cm->bm", g3i[:, :, half], extra["B"], precision=_prec()
    )
    if one_einsum:
        z_cat = jnp.concatenate([zr, v[:, None, :], zi[:, 1:half]], axis=1)  # (b, n1, n2)
        out = jnp.einsum("bkm,kM->bMm", z_cat, extra["w_cat"], precision=_prec())
    else:
        out = jnp.einsum("bkm,kM->bMm", zr, plan["w1r"], precision=_prec()) - jnp.einsum(
            "bkm,kM->bMm", zi, plan["w1i"], precision=_prec()
        )
        out = out + plan["alt"][None, :, None] * v[:, None, :]
    return out.reshape(b, n)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from gpu_fft_tpu.kernels.fused_jnp import fused_irfft_jnp
    from gpu_fft_tpu.plan import get_irfft_plan
    from gpu_fft_tpu.utils.profiling import chained_step_stats
    from gpu_fft_tpu.utils.roofline import compiled_stats

    rng = np.random.default_rng(0)
    for n in (1 << 15, 1 << 16):
        print(f"n={n}:")
        plan = get_irfft_plan(n, scale=1.0 / n)
        extra = {k: jnp.asarray(v) for k, v in build_tables(plan).items()}
        x = rng.standard_normal((1, n)).astype(np.float32)
        full = np.fft.fft(x.astype(np.float64))
        fr = jnp.asarray(full.real.astype(np.float32))
        fi = jnp.asarray(full.imag.astype(np.float32))
        ya = np.asarray(fused_irfft_jnp(fr, fi, plan))
        for lbl, one in (("F one-einsum", True), ("G two-einsum", False)):
            y = np.asarray(variant_fg(fr, fi, plan, extra, one))
            err = np.abs(y - ya).max()
            print(f"  {lbl} matches A to {err:.1e}")
            assert err < 1e-5, (lbl, err)

        s = np.float32(np.sqrt(n / 2.0))
        steps = {
            "A shipped": lambda z: fused_irfft_jnp(z, z, plan) * s,
            "F s1-128+nyq+one-einsum": lambda z: variant_fg(z, z, plan, extra, True) * s,
            "G s1-128+nyq+two-einsum": lambda z: variant_fg(z, z, plan, extra, False) * s,
        }
        for lbl, f in steps.items():
            st = chained_step_stats(f, fr, k1=20, k2=220, reps=4)
            nk = compiled_stats(f, fr)["n_kernels"]
            print(f"  {lbl}: {st.median_s * 1e6:.2f} us (iqr {st.iqr_s * 1e6:.2f}), {nk} kernels")


if __name__ == "__main__":
    main()
