"""Packed one-dot direct real transforms — the lever for the sub-50% rows.

Round-4 ask 1 follow-up to scripts/ablate_stft_floor.py's decomposition:
at direct sizes (n <= 512) the shipped forward computes TWO full-width
(n-col) dots then slices to h = n//2+1 bins (half the columns thrown away),
and the shipped half-input inverse contracts K = h = 129, which XLA
lane-pads to 256 (the §22 mechanism).  Both have an exact packed form that
is ONE zero-padding (n, n) dot:

  forward:  P = [Fr[:, :h]  |  Fi[:, 1:h-1]]            (n, n)
            y = x @ P -> re = y[:, :h], im = pad(y[:, h:])
  inverse:  T = [cr; ci[1:h-1]]                          (n, n)
            x = concat([xr, xi[:, 1:h-1]]) @ T

(ci rows at k = 0 and n/2 are exactly zero in the shipped §16 tables, so
dropping them is exact — numpy irfft's ignore-DC/Nyquist-imag semantics.)
For windowed estimators (stft/welch) the analysis window folds into P's
rows and the synthesis window into T's columns: zero extra passes.

Measures, on the real chip: forward/inverse variants at the benched batch
shapes, then the full composed stft roundtrip.
"""

from __future__ import annotations

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def tables(n: int):
    h = n // 2 + 1
    red = np.mod(
        np.outer(np.arange(n, dtype=np.int64), np.arange(n, dtype=np.int64)), n
    ).astype(np.float64)
    ang = (2.0 * np.pi / n) * red
    fr, fi = np.cos(ang), -np.sin(ang)
    pack_f = np.concatenate([fr[:, :h], fi[:, 1 : h - 1]], axis=1).astype(np.float32)
    c = np.full((n, 1), 2.0 / n)
    c[0] = 1.0 / n
    c[h - 1] = 1.0 / n
    inv = np.cos(ang) * c  # rows k: c_k cos; reuse symmetry for sin rows
    inv_r = inv[:h]
    inv_i = (np.sin(ang) * -c)[1 : h - 1]
    pack_i = np.concatenate([inv_r, inv_i], axis=0).astype(np.float32)
    return pack_f, pack_i


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from gpu_fft_tpu.kernels.large import inverse_real_half
    from gpu_fft_tpu.ops.transform import rfft_device
    from gpu_fft_tpu.utils.profiling import chained_step_stats, stft_roundtrip_step
    from gpu_fft_tpu.utils.roofline import compiled_stats

    rng = np.random.default_rng(0)

    def t(step, x, label):
        s = chained_step_stats(step, x, k1=20, k2=220, reps=4)
        try:
            nk = compiled_stats(step, x)["n_kernels"]
        except Exception:
            nk = -1
        print(
            f"  {label}: {s.median_s * 1e6:.2f} us (iqr {s.iqr_s * 1e6:.2f}), {nk} kernels",
            flush=True,
        )
        return s.median_s

    HI = dict(precision=lax.Precision.HIGHEST, preferred_element_type=jnp.float32)

    for b, n in ((253, 256), (511, 256), (64, 512)):
        h = n // 2 + 1
        pf, pi = tables(n)
        pfd, pid = jnp.asarray(pf), jnp.asarray(pi)
        x0 = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
        print(f"forward ({b},{n}):", flush=True)

        def f0(x):
            re, im = rfft_device(x)
            return jnp.concatenate([re, im[:, 1 : h - 1]], axis=1)

        def f1(x):
            return jnp.dot(x, pfd, **HI)

        a = np.asarray(jax.jit(f0)(x0))
        bb = np.asarray(jax.jit(f1)(x0))
        print(f"  parity f1 vs f0: {np.abs(a - bb).max():.3e}")
        t(f0, x0, "F0 shipped rfft_device (2 full dots + slice)")
        t(f1, x0, "F1 packed one-dot")

        print(f"inverse ({b},{h}) -> ({b},{n}):", flush=True)
        sp = np.fft.rfft(np.asarray(x0, dtype=np.float64))
        zr = jnp.asarray(sp.real.astype(np.float32))
        zi = jnp.asarray(sp.imag.astype(np.float32))

        # Both spectrum halves ride the chained carry (stacked (2, b, h)) so
        # zi is runtime data under jit — a closed-over zi would be a
        # compile-time constant XLA can fold into the dot, flattering the
        # timed variants (advisor finding, round 4).
        z0 = jnp.stack([zr, zi])

        def i0(z):
            y = inverse_real_half(z[0], z[1], n, scale=1.0 / n)
            return z.at[0].set(y[:, :h])

        def i1(z):
            y = jnp.dot(jnp.concatenate([z[0], z[1][:, 1 : h - 1]], axis=1), pid, **HI)
            return z.at[0].set(y[:, :h])

        a = np.asarray(jax.jit(i0)(z0))
        bb = np.asarray(jax.jit(i1)(z0))
        print(f"  parity i1 vs i0: {np.abs(a - bb).max():.3e}")
        t(i0, z0, "I0 shipped inverse_real_half (2 dots K=129)")
        t(i1, z0, "I1 packed concat + one-dot K=256")

    # Composed stft roundtrip: shipped vs fully packed + window-folded.
    frame, hop, L = 256, 64, 16384
    num = (L - frame) // hop + 1
    h = frame // 2 + 1
    from gpu_fft_tpu.ops.stft import frame_signal, overlap_add, window_table

    w = window_table("hann", frame).astype(np.float64)
    pf, pi = tables(frame)
    pf_w = jnp.asarray((w[:, None] * pf).astype(np.float32))  # analysis fold
    pi_w = jnp.asarray((pi * w[None, :]).astype(np.float32))  # synthesis fold
    total = (num - 1) * hop + frame
    wsq = np.zeros(total)
    for f in range(num):
        wsq[f * hop : f * hop + frame] += w * w
    den = jnp.asarray(np.where(wsq > 1e-10, wsq, 1.0).astype(np.float32))
    x0 = jnp.asarray(rng.standard_normal((1, L)).astype(np.float32))

    def s1(x):
        fz = frame_signal(x[0], frame, hop, num)
        y = jnp.dot(fz, pf_w, **HI)  # packed windowed spectrum
        # public-surface layout roundtrip (what stft -> istft pays):
        re, im = y[:, :h], jnp.pad(y[:, h:], ((0, 0), (1, 1)))
        z = jnp.concatenate([re, im[:, 1 : h - 1]], axis=1)
        fr = jnp.dot(z, pi_w, **HI)
        return (overlap_add(fr, hop, L) / den[:L])[None]

    def s2(x):
        # packed end-to-end (no split/repack): what an internal fused
        # stft->istft pipeline could do.
        fz = frame_signal(x[0], frame, hop, num)
        y = jnp.dot(fz, pf_w, **HI)
        fr = jnp.dot(y, pi_w, **HI)
        return (overlap_add(fr, hop, L) / den[:L])[None]

    s0 = stft_roundtrip_step(frame, hop)
    a = np.asarray(jax.jit(s0)(x0))
    for name, fn in (("s1", s1), ("s2", s2)):
        bb = np.asarray(jax.jit(fn)(x0))
        print(f"  parity {name} vs shipped: {np.abs(a - bb).max():.3e}")
    print("composed stft roundtrip (1,16384) f256 h64:", flush=True)
    t(s0, x0, "S0 shipped stft+istft")
    t(s1, x0, "S1 packed dots + window fold (public layout)")
    t(s2, x0, "S2 packed dots, spectrum stays packed")


if __name__ == "__main__":
    main()
