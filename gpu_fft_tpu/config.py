"""Global tuning constants and environment plumbing.

Mirrors the role of the reference's compile-time constants
(``WORKGROUP_SIZE``/``TILE_SIZE``/``TILE_BITS``, reference ``src/lib.rs:100-111``)
but sized for TPU: the relevant hardware quantities are the (8, 128) VPU lane
layout, the 128x128 MXU, and the ~16 MiB/core VMEM working set, not GPU
workgroup limits.
"""

from __future__ import annotations

import os

# ── Transform planning thresholds ────────────────────────────────────────────
# DIRECT_MAX: largest transform computed as a single DFT matrix multiply
#   X = x @ F_n  (one MXU matmul over the whole batch of rows).  The DFT matrix
#   costs 2 * n^2 * 4 bytes of VMEM, so 512 keeps the tables at 2 MiB.
DIRECT_MAX = 512

# FUSED_MAX: largest transform run as ONE fused four-step Pallas kernel
#   (reshape to (n1, n2), DFT columns, twiddle, DFT rows — all resident in
#   VMEM).  This is the analog of the reference's single-dispatch fused inner
#   kernel (``butterfly_inner``, reference ``src/butterfly.rs:84-147``), except
#   the whole transform fuses, not just the first 10 stages.
FUSED_MAX = 65536

# Maximum supported transform length.  Above FUSED_MAX the transform is
# factored recursively at the JAX level (kernels/large.py); two balanced
# levels cover up to FUSED_MAX**2, far beyond the 2**20 target.
MAX_N = 1 << 24

# NOTE: there is deliberately no "engine" flag.  Round 1 shipped a
# GPU_FFT_TPU_ENGINE dial (jnp vs hand-written Pallas kernels); round 2
# replaced it with per-size selection measured on hardware and retired the
# losing kernels — see docs/ABLATION.md and kernels/large.py.

# ── Matmul precision mode ────────────────────────────────────────────────────
# f32 MXU matmuls are emulated with bf16 passes; the mode trades accuracy
# for passes (measured on v5e at B=16 N=65,536, forward):
#   "full"  (default) — 6-pass HIGHEST: rel err ~1.8e-7; the only mode that
#                       meets the reference's 5*log2(N)*eps roundtrip gate.
#   "high"  — 3-pass:   rel err ~2e-5, ~2x faster on compute-bound configs
#                       (30 vs 57-71 us).
#   "fast"  — 1-pass:   rel err ~4e-3, ~4x faster (16.5 us); for
#                       magnitude-spectrum/serving workloads only.
# Process-level: set GPU_FFT_TPU_PRECISION before the first transform (jit
# caches trace the mode in).  Mosaic supports only DEFAULT/HIGHEST, so under
# "high" the staged large-N path routes its stage A through the jnp engine
# (kernels/large.py) — every size gets the same 3-pass compute cut.
PRECISION = os.environ.get("GPU_FFT_TPU_PRECISION", "full").strip().lower()
if PRECISION not in ("full", "high", "fast"):
    raise ValueError(
        f"GPU_FFT_TPU_PRECISION must be one of full|high|fast, got {PRECISION!r}"
    )


def matmul_precision():
    """The jax.lax.Precision for the current mode (trace-time lookup)."""
    from jax import lax

    return {
        "full": lax.Precision.HIGHEST,
        "high": lax.Precision.HIGH,
        "fast": lax.Precision.DEFAULT,
    }[PRECISION]


def mosaic_precision():
    """Pallas-kernel precision: Mosaic lowers only DEFAULT and HIGHEST."""
    from jax import lax

    return lax.Precision.DEFAULT if PRECISION == "fast" else lax.Precision.HIGHEST

# Use the Gauss/Karatsuba 3-multiplication complex matmul instead of the
# 4-multiplication form.  Saves 25% of the full-precision MXU passes (the
# dominant kernel cost); the extra additions introduce a small, bounded
# cancellation error, validated against the 5*log2(N)*eps roundtrip gate.
KARATSUBA = True

def enable_compilation_cache(path: str | None = None) -> str | None:
    """Turn on JAX's persistent compilation cache for this process.

    First-compile latency dominates interactive use behind a remote-compile
    transport (tens of seconds per (shape, direction) variant); the on-disk
    cache makes every later process start hit warm executables — the analog
    of CubeCL's documented shader-cache warm-up effect (reference
    ``README.md:87-89``), made persistent.  Called by the CLI and the bench
    harnesses; library users can call it via ``gpu_fft_tpu.config``.

    Returns the cache directory, or None if the cache could not be enabled.
    """
    import jax

    d = path or os.environ.get(
        "GPU_FFT_TPU_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "gpu_fft_tpu", "xla"),
    )
    try:
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        return d
    except Exception:
        return None


# ── Environment ──────────────────────────────────────────────────────────────
# Default backend override, mirroring the reference's feature-flag default
# runtime selection (reference ``src/lib.rs:113-117``).
BACKEND_ENV_VAR = "GPU_FFT_TPU_BACKEND"

# Path override for the native C++ backend shared library (the analog of the
# reference's ``MLX_C_PREFIX`` build-time env var, reference ``build.rs:10``).
NATIVE_LIB_ENV_VAR = "GPU_FFT_TPU_NATIVE_LIB"


def env_backend_name() -> str | None:
    """Return the backend name requested via environment, or None."""
    v = os.environ.get(BACKEND_ENV_VAR)
    return v.strip().lower() if v else None
