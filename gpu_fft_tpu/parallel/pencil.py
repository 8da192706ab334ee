"""Pencil-decomposed 2-D FFT: one image too large for a chip, rows sharded.

The standard distributed layout for big 2-D (and, by axis batching, 3-D)
transforms: the (H, W) image lives ROW-sharded over the mesh axis, so

  1. each device transforms its own rows (length-W FFTs, all local),
  2. one ``lax.all_to_all`` re-shards to a COLUMN-sharded "pencil"
     (the distributed transpose — the only communication, riding ICI),
  3. each device transforms its own columns (length-H FFTs, local),
  4. a second ``all_to_all`` restores the row-sharded layout.

Each local pass reuses the single-chip measured dispatch (the same
``transform_any`` the 1-D paths run), so this is a thin composition over
the fast path, like ``distributed.py``'s 1-D four-step.  Communication
volume is 2 * H * W * 8 bytes / device pass, independent of the mesh size.

Extension beyond the reference (it has no distributed anything); the
pencil pattern itself is the classic one (e.g. P3DFFT / heFFTe and the
scaling-book transpose recipe), realized here with shard_map + tiled
all_to_all instead of MPI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..kernels.large import transform_any

__all__ = ["fft2_sharded", "ifft2_sharded"]


def _check_dims(h: int, w: int, d: int) -> None:
    for name, n in (("H", h), ("W", w)):
        if n < 2 or n & (n - 1):
            raise ValueError(f"fft2_sharded requires power-of-two {name}, got {n}")
    if h % d or w % d:
        raise ValueError(
            f"fft2_sharded requires the mesh axis size {d} to divide both "
            f"H={h} and W={w}"
        )
    if h // d < 1 or w // d < 1:
        raise ValueError(f"image {h}x{w} too small for a {d}-device pencil split")


def _pencil(xr, xi, h: int, w: int, sign: int, mesh: Mesh, sp: str, dp):
    """Core sharded pipeline over (B, H, W) global arrays (xi may be None)."""

    def local(lr, li):
        bl, hd, _ = lr.shape  # (B_local, H/d, W)
        # 1. Row FFTs (length W), all rows of this shard folded into one call.
        rr, ri = transform_any(lr.reshape(bl * hd, w), None if li is None else li.reshape(bl * hd, w), w, sign)
        rr = rr.reshape(bl, hd, w)
        ri = ri.reshape(bl, hd, w)
        # 2. Distributed transpose: (B, H/d, W) -> (B, H, W/d).  tiled
        #    all_to_all splits the column axis d ways and concatenates the
        #    received row blocks in peer order = global row order.
        rr = lax.all_to_all(rr, sp, split_axis=2, concat_axis=1, tiled=True)
        ri = lax.all_to_all(ri, sp, split_axis=2, concat_axis=1, tiled=True)
        # 3. Column FFTs (length H): make H minor, fold, transform, restore.
        wd = rr.shape[2]
        cr = jnp.swapaxes(rr, 1, 2).reshape(bl * wd, h)
        ci = jnp.swapaxes(ri, 1, 2).reshape(bl * wd, h)
        cr, ci = transform_any(cr, ci, h, sign)
        cr = jnp.swapaxes(cr.reshape(bl, wd, h), 1, 2)
        ci = jnp.swapaxes(ci.reshape(bl, wd, h), 1, 2)
        # 4. Transpose back to the row-sharded layout: (B, H, W/d) -> (B, H/d, W).
        cr = lax.all_to_all(cr, sp, split_axis=1, concat_axis=2, tiled=True)
        ci = lax.all_to_all(ci, sp, split_axis=1, concat_axis=2, tiled=True)
        return cr, ci

    spec = P(dp, sp, None)
    yr, yi = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(spec, None if xi is None else spec),
        out_specs=(spec, spec),
        check_vma=False,  # pallas_call out_shapes don't carry vma annotations
    )(xr, xi)
    return yr, yi


def _run2d(xr, xi, mesh: Mesh, sign: int, sp: str, dp):
    squeeze = xr.ndim == 2
    if squeeze:
        xr = xr[None]
        xi = None if xi is None else xi[None]
    if xr.ndim != 3:
        raise ValueError(f"fft2_sharded expects (H, W) or (B, H, W), got {xr.shape}")
    b, h, w = xr.shape
    d = mesh.shape[sp]
    _check_dims(h, w, d)
    if dp is not None and b % mesh.shape[dp]:
        raise ValueError(
            f"batch {b} not divisible by mesh axis '{dp}' size {mesh.shape[dp]}"
        )
    yr, yi = _pencil(xr, xi, h, w, sign, mesh, sp, dp)
    return (yr[0], yi[0]) if squeeze else (yr, yi)


def fft2_sharded(x, mesh: Mesh, sp_axis: str = "sp", dp_axis: str | None = None, imag=None):
    """2-D FFT of a single large image with its ROWS sharded over the mesh.

    ``x``: (H, W) or (B, H, W) f32, power-of-two H and W both divisible by
    the ``sp_axis`` size; ``imag`` optionally supplies a complex input's
    imaginary part.  Optional ``dp_axis`` additionally shards the batch.
    Returns split-complex global arrays, row-sharded, natural order —
    ``numpy.fft.fft2`` semantics.
    """
    x = jnp.asarray(x, dtype=jnp.float32)
    xi = None if imag is None else jnp.asarray(imag, dtype=jnp.float32)
    if xi is not None and xi.shape != x.shape:
        raise ValueError(f"fft2_sharded: real and imag shapes differ: {x.shape} vs {xi.shape}")
    return _run2d(x, xi, mesh, -1, sp_axis, dp_axis)


def ifft2_sharded(xr, xi, mesh: Mesh, sp_axis: str = "sp", dp_axis: str | None = None):
    """Inverse 2-D FFT (1/(H*W) normalized) of a row-sharded split-complex
    image — the inverse of :func:`fft2_sharded`."""
    xr = jnp.asarray(xr, dtype=jnp.float32)
    xi = jnp.asarray(xi, dtype=jnp.float32)
    if xr.shape != xi.shape:
        raise ValueError(f"ifft2_sharded: shapes differ: {xr.shape} vs {xi.shape}")
    yr, yi = _run2d(xr, xi, mesh, +1, sp_axis, dp_axis)
    s = jnp.float32(1.0 / (xr.shape[-1] * xr.shape[-2]))
    return yr * s, yi * s
