"""Floor audit for stft_roundtrip_f256_h64_L16384 (31% SoL) and
fft_exact_n48000 (40%) — round-4 ask 1.

Decomposes the measured pipelines stage by stage on the real chip and
dumps the compiled fusion inventory, so each row either gains a lever or
a quantified composition floor (the §15/§16 treatment).
"""

from __future__ import annotations

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from gpu_fft_tpu.ops.stft import (
        _wola_frames,
        frame_signal,
        overlap_add,
        window_table,
    )
    from gpu_fft_tpu.ops.transform import irfft_device, rfft_device
    from gpu_fft_tpu.utils.profiling import chained_step_stats, stft_roundtrip_step
    from gpu_fft_tpu.utils.roofline import compiled_stats

    frame, hop, L = 256, 64, 16384
    num = (L - frame) // hop + 1  # 253
    w = jnp.asarray(window_table("hann", frame))
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((1, L)).astype(np.float32))

    def t(step, x, label):
        s = chained_step_stats(step, x, k1=20, k2=220, reps=4)
        try:
            nk = compiled_stats(step, x)["n_kernels"]
        except Exception:
            nk = -1
        print(f"  {label}: {s.median_s * 1e6:.2f} us (iqr {s.iqr_s * 1e6:.2f}), {nk} kernels")
        return s.median_s

    print("stft_roundtrip stages:")
    # P0: framing + deframing only (no transform) — the §16 '2.1 us' claim.
    def p0(x):
        f = frame_signal(x[0], frame, hop, num) * w[None]
        return overlap_add(f * w[None], hop, L)[None] * np.float32(2.0 / 3.0)

    t(p0, x0, "P0 frame+window+OLA only")

    # P1: + forward transform (rfft) but inverse replaced by slicing bins
    def p1(x):
        f = frame_signal(x[0], frame, hop, num) * w[None]
        fr, fi = rfft_device(f)
        g = jnp.concatenate([fr, fi[..., 1:-1]], axis=-1) * np.float32(1.0 / frame)
        return overlap_add(g * w[None], hop, L)[None] * np.float32(2.0 / 3.0)

    t(p1, x0, "P1 + rfft (inverse stubbed)")

    # P2: full roundtrip (the bench step)
    t(stft_roundtrip_step(frame, hop), x0, "P2 full stft+istft (bench)")

    # P3: transform pair alone on pre-framed data
    f0 = frame_signal(x0[0], frame, hop, num) * w[None]

    def p3(f):
        fr, fi = rfft_device(f)
        return irfft_device(fr, fi)

    t(p3, f0, "P3 rfft+irfft pair on (253,256)")

    # irfft direct: does the (B,129)@(129,256) dot pad its contraction?
    # (Chained carry must be shape-stable, so the step takes the (253,256)
    # frame buffer and slices its first 129 lanes as the spectrum.)
    def p4(z):
        h = z[..., :129]
        return irfft_device(h, h * np.float32(0.5))

    t(p4, f0, "P4 irfft alone on (253,129)")

    def p5(f):
        # Shape-stable chain carry: repack the 129+127 one-sided halves
        # into the (253, 256) frame buffer (one concat, same as P1's form).
        fr, fi = rfft_device(f)
        return jnp.concatenate([fr, fi[..., 1:-1]], axis=-1) * np.float32(1.0 / frame)

    t(p5, f0, "P5 rfft alone on (253,256), +1 repack concat")

    # P6: the K=128 lane-exact direct irfft variant (round-5 lever): the
    # h=129 contraction split into exact K=128 dots + the Nyquist
    # broadcast (plan.get_irfft_direct_k128_plan).
    from gpu_fft_tpu.kernels.fused_jnp import (
        irfft_direct_half_jnp,
        irfft_direct_half_k128_jnp,
    )
    from gpu_fft_tpu.plan import get_irfft_direct_k128_plan, get_irfft_direct_plan

    pk = get_irfft_direct_k128_plan(frame)
    pb = get_irfft_direct_plan(frame)

    def p4k(z):
        h = z[..., :129]
        return irfft_direct_half_k128_jnp(h, h * np.float32(0.5), pk)

    def p4b(z):
        h = z[..., :129]
        return irfft_direct_half_jnp(h, h * np.float32(0.5), pb)

    # Parity first (vs the shipped table form).
    a = np.asarray(jax.jit(p4b)(f0))
    bk = np.asarray(jax.jit(p4k)(f0))
    print(f"  P6 parity k128 vs shipped: {np.abs(a - bk).max() / np.abs(a).max():.2e}")
    t(p4b, f0, "P6a irfft shipped h-table (re-measure)")
    t(p4k, f0, "P6b irfft K=128 + nyquist broadcast")

    import re

    txt = jax.jit(p3).lower(f0).compile().as_text()
    print("  P3 fusion inventory:")
    for fn, shape in re.findall(r"%?(fusion[.\d]*)\s*=\s*(\S+)", txt)[:30]:
        print("    ", fn, shape[:70])

    print("fft_exact_n48000:")
    from gpu_fft_tpu.ops.exact import fft_exact_device

    se = np.float32(1.0 / np.sqrt(48000))

    def st(x):
        yr, _ = fft_exact_device(x)
        return yr * se

    xe = jnp.asarray(rng.standard_normal((1, 48000)).astype(np.float32))
    t(st, xe, "E0 mixed-radix 48000 (bench)")
    txt = jax.jit(st).lower(xe).compile().as_text()
    for fn, shape in re.findall(r"%?(fusion[.\d]*)\s*=\s*(\S+)", txt)[:25]:
        print("    ", fn, shape[:70])


if __name__ == "__main__":
    main()
