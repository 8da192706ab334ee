"""Transform planning: factorization and cached device-resident tables.

The reference specializes one compiled kernel per (n, stage, direction,
batch) tuple via CubeCL comptime parameters and relies on CubeCL's kernel
cache (reference ``README.md:407-409``).  The TPU analog is a *plan*: for each
(n, direction) we factor the transform, build the f64-accurate DFT/twiddle
tables once (kernels/tables.py), push them to device, and cache the whole
bundle.  ``jax.jit`` then specializes the compiled executable per input shape
exactly like CubeCL's comptime cache — first call compiles (~seconds, like the
reference's documented ~50 ms/variant shader warm-up, ``README.md:87-89``),
later calls hit the cache.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any

from .config import DIRECT_MAX, FUSED_MAX, MAX_N, VMEM_BUDGET_BYTES
from .kernels.tables import dft_matrix, twiddle_table

__all__ = ["FusedPlan", "get_fused_plan", "balanced_split", "batch_tile"]


def balanced_split(n: int) -> tuple[int, int]:
    """Split power-of-two n into (n1, n2), n1 <= n2, n1 * n2 = n.

    A balanced split minimizes both the matmul FLOPs (N * (n1 + n2) complex
    MACs) and the table footprint (n1^2 + n2^2 + n1*n2 complex entries), and
    keeps the MXU contraction dimensions as large as possible.
    """
    if n & (n - 1):
        raise ValueError(f"balanced_split requires a power of two, got {n}")
    m = n.bit_length() - 1
    n1 = 1 << (m // 2)
    return n1, n // n1


def batch_tile(n: int, complex_input: bool) -> int:
    """Rows of the batch processed per Pallas program (the grid tile).

    Sized so the per-program working set stays inside the ~16 MiB scoped VMEM
    limit.  Empirically the fused four-step kernel's footprint (double-buffered
    blocks + split-complex temporaries + matmul scratch) is ~160 bytes per
    block element on v5e, so the tile is capped at 64Ki elements.  This plays
    the role of the reference's workgroup sizing (``src/fft.rs:70-71``) but
    measured in bytes, not threads.
    """
    max_elems = VMEM_BUDGET_BYTES // 64 if complex_input else VMEM_BUDGET_BYTES // 48
    bt = max(1, max_elems // n)
    # Round down to a power of two, cap at 512 rows.
    bt = 1 << (bt.bit_length() - 1)
    return min(bt, 512)


@dataclass(frozen=True)
class FusedPlan:
    """Everything needed to run one fused transform of length ``n``.

    kind:
      * ``direct``   — X = x @ F_n, one complex matmul (n <= DIRECT_MAX).
      * ``fourstep`` — n = n1 * n2 factorization, two matmul passes plus a
        pointwise twiddle, all inside one Pallas kernel (n <= FUSED_MAX).
    ``sign`` is -1 for forward, +1 for inverse (unnormalized).
    """

    n: int
    sign: int
    kind: str
    n1: int
    n2: int
    tables: dict[str, Any] = field(compare=False, hash=False)


@functools.lru_cache(maxsize=None)
def get_fused_plan(n: int, sign: int) -> FusedPlan:
    if n & (n - 1) or n < 2:
        raise ValueError(f"fused plans require power-of-two n >= 2, got {n}")
    if n > FUSED_MAX:
        raise ValueError(f"n={n} exceeds FUSED_MAX={FUSED_MAX}; use the large-N path")
    if sign not in (-1, 1):
        raise ValueError(f"sign must be -1 or +1, got {sign}")

    if n <= DIRECT_MAX:
        fr, fi = dft_matrix(n, sign)
        # Tables are cached as NumPy arrays: jit lifts them into the traced
        # program as device-resident constants, and caching device/tracer
        # objects across traces would leak tracers.
        tables = {"fr": fr, "fi": fi}
        return FusedPlan(n=n, sign=sign, kind="direct", n1=n, n2=1, tables=tables)

    n1, n2 = balanced_split(n)
    f1r, f1i = dft_matrix(n1, sign)
    f2r, f2i = dft_matrix(n2, sign)
    # Twiddle oriented (n2, n1): applied to the intermediate indexed
    # [n2, k1] right after the column DFT (see kernels/fused.py).
    twr, twi = twiddle_table(n2, n1, n, sign)
    tables = {"f1r": f1r, "f1i": f1i, "f2r": f2r, "f2i": f2i, "twr": twr, "twi": twi}
    return FusedPlan(n=n, sign=sign, kind="fourstep", n1=n1, n2=n2, tables=tables)


@functools.lru_cache(maxsize=None)
def get_large_twiddle(n: int, sign: int) -> tuple[Any, Any, int, int]:
    """Twiddle table and (n1, n2) split for the JAX-level large-N recursion."""
    if n <= FUSED_MAX:
        raise ValueError(f"n={n} fits a fused plan; large twiddles not needed")
    if n > MAX_N:
        raise ValueError(f"n={n} exceeds MAX_N={MAX_N}")
    n1, n2 = balanced_split(n)
    twr, twi = twiddle_table(n2, n1, n, sign)
    return twr, twi, n1, n2
