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

# Minimum length at which the forward REAL-input transform switches to the
# fused half-length packed transform + untangle ("rfft kernel"), halving the
# dominant matmul work.  The kernel's layout-forced factorization
# (n/256, 128) is only balanced from 32768 up; below that the plain real
# four-step path is faster (measured on v5e).
RFFT_MIN = 32768

# Maximum supported transform length.  Above FUSED_MAX the transform is
# factored recursively at the JAX level (kernels/large.py); two balanced
# levels cover up to FUSED_MAX**2, far beyond the 2**20 target.
MAX_N = 1 << 24

# VMEM byte budget used when choosing the per-program batch tile for the
# fused kernels.  Conservative: leaves room for the compiler's own buffers
# within the ~16 MiB scoped-VMEM limit observed on v5e.
VMEM_BUDGET_BYTES = 3 * 1024 * 1024

# Kernel engine for the PALLAS backend's transforms:
#   "auto"   — jnp-level fused transforms (XLA-scheduled; fastest measured)
#              plus the Pallas stage-A kernel for large N.
#   "jnp"    — jnp-level everywhere (including the large-N column stage).
#   "pallas" — hand-written Pallas kernels everywhere (incl. the fused rfft
#              kernel); slower on v5e but kept as the explicit kernel path.
# Override with GPU_FFT_TPU_ENGINE.
ENGINE = os.environ.get("GPU_FFT_TPU_ENGINE", "auto").strip().lower()
if ENGINE not in ("auto", "jnp", "pallas"):
    raise ValueError(
        f"GPU_FFT_TPU_ENGINE must be one of auto|jnp|pallas, got {ENGINE!r}"
    )

# Use the Gauss/Karatsuba 3-multiplication complex matmul instead of the
# 4-multiplication form.  Saves 25% of the full-precision MXU passes (the
# dominant kernel cost); the extra additions introduce a small, bounded
# cancellation error, validated against the 5*log2(N)*eps roundtrip gate.
KARATSUBA = True

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
