"""XLA backend: the vendor FFT (``jnp.fft``) behind the library API.

The analog of the reference's MLX backend — delegating to a platform-provided
FFT while keeping the library's conventions (reference ``src/mlx/fft.rs:6-81``,
``ffi/mlx_fft.c:34-41``: MLX with NORM_BACKWARD, i.e. 1/N on the inverse,
identical to ``jnp.fft.ifft``).  Doubles as the independent numerical oracle
for the parity test suite (the ``tests/parity.rs`` pattern, per SURVEY §4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["forward", "inverse"]


@jax.jit
def _forward(x):
    spec = jnp.fft.fft(x.astype(jnp.complex64), axis=-1)
    return jnp.real(spec).astype(jnp.float32), jnp.imag(spec).astype(jnp.float32)


@jax.jit
def _inverse(xr, xi):
    sig = jnp.fft.ifft(jax.lax.complex(xr, xi), axis=-1)
    return jnp.real(sig).astype(jnp.float32), jnp.imag(sig).astype(jnp.float32)


def forward(x):
    return _forward(x)


def inverse(xr, xi):
    return _inverse(xr, xi)
