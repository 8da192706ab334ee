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
from .kernels.tables import dft_matrix_ext, twiddle_table

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
    limit: empirically the fused four-step kernel's footprint (double-buffered
    blocks + split-complex temporaries + matmul scratch) is ~160 bytes per
    block element on v5e.  Measured: larger tiles do NOT run faster (grid
    steps pipeline compute behind DMA), so the budget only needs to avoid
    OOM.  This plays the role of the reference's workgroup sizing
    (``src/fft.rs:70-71``) but measured in bytes, not threads.
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
      * ``rfft``     — real-input forward via the fused half-length kernel
        (n1, n2 are the HALF-transform factors; see get_rfft_plan).
    ``sign`` is -1 for forward, +1 for inverse (unnormalized).
    """

    n: int
    sign: int
    kind: str
    n1: int
    n2: int
    tables: dict[str, Any] = field(compare=False, hash=False)


@functools.lru_cache(maxsize=None)
def get_fused_plan(n: int, sign: int, wide: bool = False) -> FusedPlan:
    """``wide=True`` selects the wide-batch split (n2 = 128): measured on
    v5e, a full-lane contraction in the dominant second matmul beats the
    FLOP-minimizing balanced split once the batch supplies enough rows
    (e.g. B=64 n=4096: 11.0 us vs 18.2; B=256: 30.9 vs 68.3), while the
    balanced split stays ahead for small batches."""
    if n & (n - 1) or n < 2:
        raise ValueError(f"fused plans require power-of-two n >= 2, got {n}")
    if n > FUSED_MAX:
        raise ValueError(f"n={n} exceeds FUSED_MAX={FUSED_MAX}; use the large-N path")
    if sign not in (-1, 1):
        raise ValueError(f"sign must be -1 or +1, got {sign}")

    if n <= DIRECT_MAX:
        fr, fi, fs, fd = dft_matrix_ext(n, sign)
        # Tables are cached as NumPy arrays: jit lifts them into the traced
        # program as device-resident constants, and caching device/tracer
        # objects across traces would leak tracers.  The sum/diff variants
        # feed the 3-multiplication complex matmul (kernels/fused.py).
        tables = {"fr": fr, "fi": fi, "fs": fs, "fd": fd}
        return FusedPlan(n=n, sign=sign, kind="direct", n1=n, n2=1, tables=tables)

    if wide and n >= 256:
        n1, n2 = max(2, n // 128), min(128, n // 2)
    else:
        n1, n2 = balanced_split(n)
    f1r, f1i, f1s, f1d = dft_matrix_ext(n1, sign)
    f2r, f2i, f2s, f2d = dft_matrix_ext(n2, sign)
    # Twiddle oriented (n2, n1): applied to the intermediate indexed
    # [n2, k1] right after the column DFT (see kernels/fused.py).
    twr, twi = twiddle_table(n2, n1, n, sign)
    tables = {
        "f1r": f1r, "f1i": f1i, "f1s": f1s, "f1d": f1d,
        "f2r": f2r, "f2i": f2i, "f2s": f2s, "f2d": f2d,
        "twr": twr, "twi": twi,
    }
    return FusedPlan(n=n, sign=sign, kind="fourstep", n1=n1, n2=n2, tables=tables)


# Tile width for the even/odd deinterleave selection matmul (see
# kernels/large.py::_rfft_real).  256 divides every supported rfft length.
PACK_TILE = 256


@functools.lru_cache(maxsize=None)
def get_pack_matrix() -> Any:
    """(PACK_TILE, PACK_TILE) selection matrix D with D[2j, j] = D[2j+1, t/2+j] = 1.

    ``x_tiles @ D`` deinterleaves even/odd samples on the MXU: lane-strided
    slicing is a slow gather on TPU (~150 us for a 4 MiB batch), while a 0/1
    selection matmul at HIGHEST precision is exact and runs at memory speed.
    """
    import numpy as np

    t = PACK_TILE
    d = np.zeros((t, t), dtype=np.float32)
    j = np.arange(t // 2)
    d[2 * j, j] = 1.0
    d[2 * j + 1, t // 2 + j] = 1.0
    return d


@functools.lru_cache(maxsize=None)
def get_rfft_plan(n: int) -> FusedPlan:
    """Plan for the fully-fused real-input forward transform ("rfft kernel").

    The kernel packs even/odd samples with a selection matmul, runs the
    half-length complex four-step, and untangles the conjugate-symmetric
    spectrum in VMEM.  The untangle needs Z[(h-k) % h]; Mosaic has no flip
    primitive, so the index reversal is done with exact 0/1 permutation
    matmuls in digit space:

      rev(k1 + h1*k2) digits: (h1-k1 mod h1, h2-1-k2) for k1 >= 1,
                              (0,            h2-k2 mod h2) for k1 == 0.

    ``pc`` permutes the k1 (lane) axis; ``q1``/``q0`` permute the k2 axis via
    right-matmul on the swapped layout; the k1 == 0 column selects the q0
    variant.  ``u`` is the untangle twiddle exp(-2pi*i*k/n) laid out
    [k2, k1].
    """
    import numpy as np

    from .kernels.tables import _split_exp

    if n < 2048 or n & (n - 1):
        raise ValueError(f"rfft plan requires power-of-two n >= 2048, got {n}")
    h = n // 2
    if h > FUSED_MAX:
        raise ValueError(f"rfft plan half-length {h} exceeds FUSED_MAX")
    # Split chosen so the packed even/odd tile layout IS the (h1, h2) view:
    # the selection matmul yields (n / PACK_TILE, PACK_TILE/2)-tiled halves,
    # i.e. exactly (h1, h2) = (n/256, 128) — Mosaic cannot reshape across
    # lane boundaries, so the factorization must follow the layout.
    h1, h2 = n // PACK_TILE, PACK_TILE // 2
    f1r, f1i, f1s, f1d = dft_matrix_ext(h1, -1)
    f2r, f2i, f2s, f2d = dft_matrix_ext(h2, -1)
    twr, twi = twiddle_table(h2, h1, h, -1)
    pc = np.zeros((h1, h1), dtype=np.float32)
    k1 = np.arange(h1)
    pc[(h1 - k1) % h1, k1] = 1.0
    q1 = np.zeros((h2, h2), dtype=np.float32)
    q0 = np.zeros((h2, h2), dtype=np.float32)
    k2 = np.arange(h2)
    q1[h2 - 1 - k2, k2] = 1.0
    q0[(h2 - k2) % h2, k2] = 1.0
    flat_k = np.add.outer(h1 * np.arange(h2, dtype=np.int64), np.arange(h1, dtype=np.int64))
    ur, ui = _split_exp(flat_k, n, -1)
    tables = {
        "sel": get_pack_matrix(),
        "f1r": f1r, "f1i": f1i, "f1s": f1s, "f1d": f1d,
        "f2r": f2r, "f2i": f2i, "f2s": f2s, "f2d": f2d,
        "twr": twr, "twi": twi,
        "pc": pc, "q1": q1, "q0": q0,
        "ur": ur, "ui": ui,
    }
    return FusedPlan(n=n, sign=-1, kind="rfft", n1=h1, n2=h2, tables=tables)


# Stage-B row length the staged large-N split aims for: measured sweet spot
# of the fused jnp transform on v5e (b16 x 16384 runs at ~90 Gelem/s).
# Smaller stage-A digits also mean fewer column-DFT FLOPs; measured overall:
# 2^20 forward 200us -> 119us vs the old fixed n1=256.
STAGE_B_TARGET = 16384

# Stage-A digit bounds: contraction >= 16 keeps the column matmul sane;
# <= 512 caps the F1 table set at ~4 MiB of VMEM.
STAGE_A_N1_MIN = 16
STAGE_A_N1_MAX = 512

def stage_a_col_tile(n1: int, n2: int) -> int:
    """Lane width of one stage-A program's column block.

    At n1 = 512 the F1 table set alone is ~4 MiB of VMEM, so the data blocks
    shrink to stay inside the ~16 MiB scoped limit (hit at n = 2^23).  The
    tile is clamped to n2 so the grid can never be empty (production plans
    always have n2 >= STAGE_B_TARGET, but forced small configs must not
    silently return garbage).
    """
    return min(256 if n1 >= 512 else 512, n2)


def _stage_a_n1(n: int) -> int:
    n1 = max(STAGE_A_N1_MIN, min(STAGE_A_N1_MAX, n // STAGE_B_TARGET))
    # Keep n2 a fused size.
    while n // n1 > FUSED_MAX:
        n1 *= 2
    return n1


@functools.lru_cache(maxsize=None)
def get_stage_a_plan(n: int, sign: int) -> dict[str, Any]:
    """Tables for the staged large-N path (see kernels/large.py).

    ``f1``: the n1 x n1 column-DFT matrix (+ Karatsuba sum/diff variants);
    ``tw``: the full (n1, n2) twiddle W_n^(k1 * col), block-fetched by the
    kernel so only one column tile is VMEM-resident at a time.
    """
    if n <= FUSED_MAX:
        raise ValueError(f"n={n} fits a fused plan; the staged path is not needed")
    if n > MAX_N:
        raise ValueError(f"n={n} exceeds MAX_N={MAX_N}")
    n1 = _stage_a_n1(n)
    n2 = n // n1
    f1r, f1i, f1s, f1d = dft_matrix_ext(n1, sign)
    twr, twi = twiddle_table(n1, n2, n, sign)
    return {
        "n1": n1,
        "n2": n2,
        "f1r": f1r, "f1i": f1i, "f1s": f1s, "f1d": f1d,
        "twr": twr, "twi": twi,
    }
