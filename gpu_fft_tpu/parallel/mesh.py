"""Batch sharding over the device mesh (the "data-parallel" axis).

The reference packs B signals into one flat buffer so a single dispatch
covers the whole batch (``src/fft.rs:191-205``).  Across chips the same idea
is a ``shard_map`` over the batch dimension: each device runs the fused
kernels on its rows, no collective traffic at all — batch FFT is
embarrassingly parallel, so the shard-map body is exactly the single-chip
transform.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..kernels.large import transform_any

__all__ = [
    "default_mesh",
    "fft_batch_sharded",
    "ifft_batch_sharded",
    "fft2_batch_sharded",
]


def default_mesh(axis_name: str = "dp", devices=None) -> Mesh:
    """A 1-D mesh over all (or the given) devices."""
    import numpy as np

    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), (axis_name,))


def _shard_map(fn, mesh, in_specs, out_specs):
    # check_vma=False: pallas_call out_shapes don't carry vma annotations yet.
    return jax.shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False)


def fft_batch_sharded(x, mesh: Mesh, axis_name: str = "dp"):
    """Forward FFT of (B, n) with B sharded over ``axis_name``.

    B must divide evenly by the mesh axis size.  Returns split-complex
    (re, im) with the same sharding.
    """
    x = jnp.asarray(x, dtype=jnp.float32)
    b, n = x.shape
    d = mesh.shape[axis_name]
    if b % d:
        raise ValueError(f"batch {b} not divisible by mesh axis '{axis_name}' size {d}")

    def local(xl):
        return transform_any(xl, None, n, -1)

    spec = P(axis_name, None)
    return _shard_map(local, mesh, (spec,), (spec, spec))(x)


def fft2_batch_sharded(x, mesh: Mesh, axis_name: str = "dp"):
    """Forward 2-D FFT of a (B, H, W) image batch with B sharded over the
    mesh — each device transforms its images locally, zero collectives.

    B must divide evenly by the mesh axis size.  Returns split-complex
    (re, im) with the same sharding.  Sides follow the fft2 contract (any
    length >= 2; non-pow2 sides run via Bluestein).
    """
    from ..ops.fft2d import _check_sides, _transform2d

    x = jnp.asarray(x, dtype=jnp.float32)
    if x.ndim != 3:
        raise ValueError(f"fft2_batch_sharded expects (B, H, W), got {x.shape}")
    b = x.shape[0]
    _check_sides(x.shape[1], x.shape[2])
    d = mesh.shape[axis_name]
    if b % d:
        raise ValueError(f"batch {b} not divisible by mesh axis '{axis_name}' size {d}")

    def local(xl):
        return _transform2d(xl, None, -1)

    spec = P(axis_name, None, None)
    return _shard_map(local, mesh, (spec,), (spec, spec))(x)


def ifft_batch_sharded(xr, xi, mesh: Mesh, axis_name: str = "dp"):
    """Inverse FFT of a (B, n) split-complex batch sharded over ``axis_name``."""
    xr = jnp.asarray(xr, dtype=jnp.float32)
    xi = jnp.asarray(xi, dtype=jnp.float32)
    b, n = xr.shape
    d = mesh.shape[axis_name]
    if b % d:
        raise ValueError(f"batch {b} not divisible by mesh axis '{axis_name}' size {d}")

    def local(r, i):
        yr, yi = transform_any(r, i, n, +1)
        s = jnp.float32(1.0 / n)
        return yr * s, yi * s

    spec = P(axis_name, None)
    return _shard_map(local, mesh, (spec, spec), (spec, spec))(xr, xi)
