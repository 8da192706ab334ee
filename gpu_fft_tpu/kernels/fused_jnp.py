"""Fused transforms expressed as plain JAX ops (the default engine).

Same math and tables as the Pallas kernels in ``fused.py`` — direct DFT
matmul and the four-step factorization — but written as jnp ops and left to
XLA to fuse and schedule.  Measured head-to-head on v5e (interleaved chained
timing), XLA's scheduling of this graph beats the hand-written Pallas
kernels at every fused size (e.g. 3.4 us vs 10.4 us at B=1 N=65536; 76 vs 99
us at B=16), because the per-pallas-call overhead and the kernel's serialized
op chain cost more than HBM round-trips between XLA fusions.  This is the
"let XLA fuse — don't hand-schedule what the compiler already does" rule in
action; the Pallas engine remains available (``config.ENGINE = "pallas"``)
and still wins for the large-N column stage (see kernels/large.py).

Notably this also obsoletes the fused rfft kernel on the default path: the
real-input four-step here (2-matmul first stage) beats the pallas rfft
kernel's packed half-transform at both B=1 and B=16.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from ..config import KARATSUBA
from ..plan import FusedPlan

__all__ = ["fused_fft_jnp", "stage_a_jnp"]

_HI = lax.Precision.HIGHEST


def _dot(a, b):
    return jnp.dot(a, b, precision=_HI, preferred_element_type=jnp.float32)


def _cmatmul(ar, ai, t, prefix):
    """Split-complex matmul against the plan's table group ``prefix``."""
    fr, fi = t[prefix + "r"], t[prefix + "i"]
    if KARATSUBA:
        k1 = _dot(ar + ai, fr)
        k2 = _dot(ar, t[prefix + "d"])
        k3 = _dot(ai, t[prefix + "s"])
        return k1 - k3, k1 + k2
    return _dot(ar, fr) - _dot(ai, fi), _dot(ar, fi) + _dot(ai, fr)


def fused_fft_jnp(xr, xi, plan: FusedPlan):
    """One fused transform over a (B, n) batch, as jnp ops.

    Semantics identical to ``fused.fused_fft``: ``xi`` may be None (real
    input), output is split-complex in natural order, unnormalized.
    """
    b, n = xr.shape
    assert n == plan.n, (n, plan.n)
    t = plan.tables

    if plan.kind == "direct":
        if xi is None:
            return _dot(xr, t["fr"]), _dot(xr, t["fi"])
        return _cmatmul(xr, xi, t, "f")

    n1, n2 = plan.n1, plan.n2
    xtr = jnp.swapaxes(xr.reshape(b, n1, n2), 1, 2).reshape(b * n2, n1)
    if xi is None:
        pr = _dot(xtr, t["f1r"])
        pi = _dot(xtr, t["f1i"])
    else:
        xti = jnp.swapaxes(xi.reshape(b, n1, n2), 1, 2).reshape(b * n2, n1)
        pr, pi = _cmatmul(xtr, xti, t, "f1")
    p3r = pr.reshape(b, n2, n1)
    p3i = pi.reshape(b, n2, n1)
    zr = p3r * t["twr"] - p3i * t["twi"]
    zi = p3r * t["twi"] + p3i * t["twr"]
    qr = jnp.swapaxes(zr, 1, 2).reshape(b * n1, n2)
    qi = jnp.swapaxes(zi, 1, 2).reshape(b * n1, n2)
    rr, ri = _cmatmul(qr, qi, t, "f2")
    yr = jnp.swapaxes(rr.reshape(b, n1, n2), 1, 2).reshape(b, n)
    yi = jnp.swapaxes(ri.reshape(b, n1, n2), 1, 2).reshape(b, n)
    return yr, yi


def stage_a_jnp(x3r, x3i, plan: dict):
    """jnp variant of the large-N column-DFT+twiddle stage (engine="jnp").

    ``x3*``: (B, n1, n2) views; x3i may be None.  The column DFT is an
    einsum contracting the n1 axis (a left matmul per batch element).
    """
    f1r, f1i = plan["f1r"], plan["f1i"]
    twr, twi = plan["twr"], plan["twi"]
    pr = jnp.einsum("ka,bac->bkc", f1r, x3r, precision=_HI)
    pi = jnp.einsum("ka,bac->bkc", f1i, x3r, precision=_HI)
    if x3i is not None:
        pr = pr - jnp.einsum("ka,bac->bkc", f1i, x3i, precision=_HI)
        pi = pi + jnp.einsum("ka,bac->bkc", f1r, x3i, precision=_HI)
    return pr * twr - pi * twi, pr * twi + pi * twr
