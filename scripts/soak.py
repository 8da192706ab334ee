"""Hardware soak: random configs through the device API vs the on-device oracle.

The test suite pins known boundaries; this harness hammers RANDOM (B, n)
configs on real hardware — including memory-heavy batches — comparing each
against `jnp.fft` computed on device (no host oracle transfers), to catch
VMEM/layout regressions at shapes nobody hand-picked.  Exits non-zero on
any failure.

Usage: python scripts/soak.py [--iters N] [--seed S] [--max-bytes B]
"""

from __future__ import annotations

import argparse
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--max-bytes", type=int, default=512 * 1024 * 1024)
    args = ap.parse_args()

    import jax.numpy as jnp

    import gpu_fft_tpu as gf
    from gpu_fft_tpu.config import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(args.seed)
    failures = 0
    ran = 0
    while ran < args.iters:
        b = int(rng.choice([1, 2, 3, 8, 24, 96, 256, 1024]))
        n = 1 << int(rng.integers(1, 21))
        # Peak footprint is ~8x the input: complex64 oracle (2x), two
        # split-complex result pairs (4x), plus staged intermediates.
        if b * n * 4 * 8 > args.max_bytes:
            continue
        ran += 1
        xs = jnp.asarray(rng.uniform(-1, 1, (b, n)).astype(np.float32))
        try:
            yr, yi = gf.fft_device(xs)
            rr, ri = gf.ifft_device(yr, yi)
            spec = jnp.fft.fft(xs.astype(jnp.complex64))
            denom = jnp.max(jnp.abs(spec)) + 1e-9
            # Check BOTH components: real input has Re(conj X) == Re(X), so a
            # conjugation regression would slip past a real-only gate.
            fwd = float(
                jnp.maximum(
                    jnp.max(jnp.abs(yr - jnp.real(spec))),
                    jnp.max(jnp.abs(yi - jnp.imag(spec))),
                )
                / denom
            )
            rt = float(jnp.max(jnp.abs(rr - xs)))
            bound = 5.0 * np.log2(max(n, 2)) * float(np.finfo(np.float32).eps)
            good = fwd < 1e-4 and rt <= max(bound, 1e-5)
        except Exception as e:  # any crash is a failure worth a red exit
            print(f"b={b:5d} n={n:8d}: EXCEPTION {str(e)[:120]}", flush=True)
            failures += 1
            continue
        print(f"b={b:5d} n={n:8d}: fwd {fwd:.1e} roundtrip {rt:.1e} "
              f"{'ok' if good else 'FAIL'}", flush=True)
        failures += 0 if good else 1
    print(f"soak: {ran - failures}/{ran} ok")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
