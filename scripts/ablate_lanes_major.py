"""Pipeline v2 prototype: the four-step with k1 parked on the LANE axis.

Direct measurement this round re-attributed the 2^20 budget: the Pallas
stage-A kernel composes at ~17.5 us (its model), while stage_b_jnp ALONE
measures ~72 us against a ~49-55 us class model — the folded einsums
("bkac,aj->bkcj", "bkcj,cJ->bJjk") contract middle axes and permute
outputs, and XLA pays hidden relayouts for it.

Alternative formulation: transpose the INPUT once to (n2, n1) so the k1
digit rides the lane axis through every later stage:

  xt[c, a]  = x[a*n2 + c]                     (one real-input relayout)
  P[c, k1]  = xt @ F1  * W_n^(c*k1)           (RIGHT matmul, K=n1)
  view P as [a1, a2, k1], c = a1*m2 + a2
  T1[j1, a2, k1] = sum_a1 W_m1[j1, a1] P      (LEFT matmul, K=m1)
  T1 *= W_n2^(j1*a2)
  T2[j2, j1, k1] = sum_a2 W_m2[j2, a2] T1     (LEFT matmul, K=m2)
  flat [j2, j1, k1] == natural order           (ZERO output transposes)

Fused-size variant (n2 <= 256): stage B is a single left matmul
  out[j, k1] = sum_c W_n2[j, c] P[c, k1]      -> flat natural order.

This script measures the v2 graph vs the shipped transform_any at
B=1 n=2^20 / 2^22, and B=1/B=16 n=65536, with accuracy vs numpy f64.

Run on TPU:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/ablate_lanes_major.py
"""

from __future__ import annotations

import sys

import numpy as np

import jax
import jax.numpy as jnp


def tw(rows, cols, denom, row_stride=1, col_stride=1):
    """f64-generated twiddle table W_denom^(r*row_stride * c*col_stride)."""
    r = np.arange(rows, dtype=np.int64)[:, None] * row_stride
    c = np.arange(cols, dtype=np.int64)[None, :] * col_stride
    ang = -2.0 * np.pi * ((r * c) % denom) / denom
    return (
        jnp.asarray(np.cos(ang).astype(np.float32)),
        jnp.asarray(np.sin(ang).astype(np.float32)),
    )


def _e(eq, a, b):
    return jnp.einsum(eq, a, b, precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)


def kara(eq, zr, zi, tr, ts, td):
    k1 = _e(eq, zr + zi, tr)
    k2 = _e(eq, zr, td)
    k3 = _e(eq, zi, ts)
    return k1 - k3, k1 + k2


def kara_l(eq, tr, ts, td, zr, zi):
    """Karatsuba for table-on-the-left einsums."""
    k1 = _e(eq, tr, zr + zi)
    k2 = _e(eq, td, zr)
    k3 = _e(eq, ts, zi)
    return k1 - k3, k1 + k2


def build_v2(n: int, n1: int):
    n2 = n // n1
    f1r, f1i = tw(n1, n1, n1)  # F1[a, k1]
    f1s, f1d = f1r + f1i, f1i - f1r
    if n2 <= 256:
        # Fused-size v2: stage B is one left matmul over c.
        oar, oai = tw(n2, n1, n)  # W_n^(c*k1)
        w2r, w2i = tw(n2, n2, n2)  # W_n2[j, c]
        w2s, w2d = w2r + w2i, w2i - w2r

        def run(x):  # x: (b, n) real
            b = x.shape[0]
            xt = jnp.swapaxes(x.reshape(b, n1, n2), 1, 2)  # (b, c, a)
            pr = _e("bca,ak->bck", xt, f1r)
            pi = _e("bca,ak->bck", xt, f1i)
            zr = pr * oar[None] - pi * oai[None]
            zi = pr * oai[None] + pi * oar[None]
            rr, ri = kara_l("jc,bck->bjk", w2r, w2s, w2d, zr, zi)
            return rr.reshape(b, n), ri.reshape(b, n)

        return run

    m1 = n2 // 128
    m2 = 128
    # Stage-A twiddle factored over c = a1*m2 + a2:
    # W_n^(c k1) = W_(n/m2)^(a1 k1) * W_n^(a2 k1)
    oar, oai = tw(m1, n1, n // m2)   # [a1, k1]
    iar, iai = tw(m2, n1, n)         # [a2, k1]
    w1r, w1i = tw(m1, m1, m1)        # W_m1[j1, a1]
    w1s, w1d = w1r + w1i, w1i - w1r
    tbr, tbi = tw(m1, m2, n2)        # W_n2^(j1 a2)  [j1, a2]
    w2r, w2i = tw(m2, m2, m2)        # W_m2[j2, a2]
    w2s, w2d = w2r + w2i, w2i - w2r

    def run(x):  # x: (b, n) real
        b = x.shape[0]
        xt = jnp.swapaxes(x.reshape(b, n1, n2), 1, 2)  # (b, c, a)
        pr = _e("bca,ak->bck", xt, f1r)  # (b, c, k1)
        pi = _e("bca,ak->bck", xt, f1i)
        p4r = pr.reshape(b, m1, m2, n1)
        p4i = pi.reshape(b, m1, m2, n1)
        twr = oar[:, None, :] * iar[None, :, :] - oai[:, None, :] * iai[None, :, :]
        twi = oar[:, None, :] * iai[None, :, :] + oai[:, None, :] * iar[None, :, :]
        zr = p4r * twr[None] - p4i * twi[None]
        zi = p4r * twi[None] + p4i * twr[None]
        # Stage B1: contract a1 -> j1 (left matmul, k1 on lanes).
        t1r, t1i = kara_l("ja,bask->bjsk", w1r, w1s, w1d, zr, zi)
        ur = t1r * tbr[None, :, :, None] - t1i * tbi[None, :, :, None]
        ui = t1r * tbi[None, :, :, None] + t1i * tbr[None, :, :, None]
        # Stage B2: contract a2 -> j2 (left matmul, k1 on lanes).
        rr, ri = kara_l("Ja,bjak->bJjk", w2r, w2s, w2d, ur, ui)
        return rr.reshape(b, n), ri.reshape(b, n)

    return run


def main():
    from gpu_fft_tpu.config import enable_compilation_cache
    from gpu_fft_tpu.kernels.large import transform_any
    from gpu_fft_tpu.utils.profiling import chained_step_stats

    enable_compilation_cache()
    rng = np.random.default_rng(0)

    def mk(fn):
        def step(z):
            a, b = fn(z)
            return a * jnp.float32(1e-3) + b * jnp.float32(1e-3) + z * jnp.float32(0.5)
        return step

    for b, n, n1 in [(1, 1 << 20, 128), (1, 1 << 22, 128), (1, 65536, 256),
                     (16, 65536, 256)]:
        x_np = rng.standard_normal((b, n)).astype(np.float32)
        x = jnp.asarray(x_np)
        v2 = jax.jit(build_v2(n, n1))
        ship = jax.jit(lambda z, n=n: transform_any(z, None, n, -1))
        # Accuracy first.
        rr, ri = v2(x)
        ref = np.fft.fft(x_np[0].astype(np.float64))
        nrm = np.abs(ref).max()
        err = max(np.abs(np.asarray(rr[0], np.float64) - ref.real).max(),
                  np.abs(np.asarray(ri[0], np.float64) - ref.imag).max()) / nrm
        bound = 5 * np.log2(n) * np.finfo(np.float32).eps
        sv = chained_step_stats(mk(v2), x, k1=5, k2=105, reps=5)
        ss = chained_step_stats(mk(ship), x, k1=5, k2=105, reps=5)
        print(f"B={b:3d} n=2^{int(np.log2(n)):2d}: v2 {sv.median_s*1e6:8.2f} us "
              f"(iqr {sv.iqr_s*1e6:5.2f})  shipped {ss.median_s*1e6:8.2f} us "
              f"(iqr {ss.iqr_s*1e6:5.2f})  v2_rel_err={err:.2e} "
              f"({'OK' if err < bound else 'FAIL'} vs {bound:.1e})",
              flush=True)


if __name__ == "__main__":
    main()
