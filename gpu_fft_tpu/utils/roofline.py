"""Roofline accounting: FLOPs, bytes, and speed-of-light for each config.

The repo's north star (BASELINE.json) is stated as a fraction of the HBM
roofline, so the bench artifacts must *compute* that fraction, not assert it.
For a transform config this module counts:

* ``flops`` — useful FLOPs of the matmul-FFT algorithm as planned (mirrors
  the factorization in ``kernels/large.py:transform_any`` / ``plan.py``).
  These are *algorithm* FLOPs; each f32 MXU matmul additionally runs as
  multiple bf16 passes (``precision_passes``: 6 under ``Precision.HIGHEST``,
  3 under the error-corrected 3-pass form, 1 raw bf16), which is what the
  MXU actually executes.
* ``bytes`` — the speed-of-light HBM traffic: input + output arrays once.
  Intermediates that XLA materializes between fusions are *not* counted, so
  the derived time is a true lower bound.
* ``sol_us`` — max(byte-bound, compute-bound) time on the detected chip;
  ``pct_sol = sol_us / measured_us`` says how close a measurement is to the
  hardware ceiling, and ``bound`` names which wall it is.

Chip peak numbers are from published TPU specs (HBM GB/s, bf16 TFLOP/s).
"""

from __future__ import annotations

from dataclasses import dataclass

from ..config import DIRECT_MAX, FUSED_MAX

__all__ = ["ChipSpec", "detect_chip", "transform_cost", "roofline_row", "CHIPS"]


@dataclass(frozen=True)
class ChipSpec:
    name: str
    hbm_gbps: float  # HBM bandwidth, GB/s
    bf16_tflops: float  # MXU peak, bf16 TFLOP/s


CHIPS = {
    "v5e": ChipSpec("v5e", 819.0, 197.0),
    "v5p": ChipSpec("v5p", 2765.0, 459.0),
    "v4": ChipSpec("v4", 1228.0, 275.0),
    "v6e": ChipSpec("v6e", 1640.0, 918.0),
    # CPU fallback so the accounting stays defined on the test mesh; the
    # numbers are order-of-magnitude only and flagged by the name.
    "cpu-approx": ChipSpec("cpu-approx", 50.0, 1.0),
}


def detect_chip() -> ChipSpec:
    """Best-effort chip detection from the default JAX device."""
    import jax

    d = jax.devices()[0]
    kind = (getattr(d, "device_kind", "") or "").lower() + " " + str(d).lower()
    for key in ("v6e", "v5p", "v5e", "v4"):
        if key in kind:
            return CHIPS[key]
    if "v5 lite" in kind or "litepod" in kind:
        return CHIPS["v5e"]
    if jax.default_backend() == "tpu" or "tpu" in kind or "axon" in kind:
        return CHIPS["v5e"]  # this environment's tunnel chip
    return CHIPS["cpu-approx"]


def _fused_split(n: int, b: int) -> tuple[int, int]:
    """The (wide-batch aware) fused factorization transform_any will use."""
    from ..plan import fused_split

    return fused_split(n, b)


def _stage_a_n1(n: int) -> int:
    from ..plan import _stage_a_n1 as f

    return f(n)


def transform_flops(b: int, n: int, real_input: bool) -> float:
    """Algorithm FLOPs of one planned transform over a (b, n) batch.

    A real matmul (m, k) @ (k, j) counts 2*m*k*j; the Karatsuba complex
    matmul is 3 real matmuls plus 5 elementwise passes; a complex elementwise
    multiply is 6 FLOPs/element.  Mirrors ``kernels/large.py:transform_any``.
    """
    if n <= DIRECT_MAX:
        # Direct: x @ F_n. Real input: 2 matmuls; complex: Karatsuba 3.
        m = 2 if real_input else 3
        return m * 2.0 * b * n * n + (0 if real_input else 7.0 * b * n)
    if n <= FUSED_MAX:
        n1, n2 = _fused_split(n, b)
        # Stage 1 column DFT: rows = b*n2, contraction n1, width n1.
        s1 = (2 if real_input else 3) * 2.0 * b * n * n1
        tw = 6.0 * b * n
        # Stage 2 row DFT: complex Karatsuba over b*n1 rows of length n2.
        s2 = 3 * 2.0 * b * n * n2
        return s1 + tw + s2
    n1 = _stage_a_n1(n)
    n2 = n // n1
    sa = (2 if real_input else 3) * 2.0 * b * n * n1 + 6.0 * b * n
    return sa + transform_flops(b * n1, n2, real_input=False)


def transform_cost(b: int, n: int, kind: str = "fft") -> dict:
    """FLOPs + speed-of-light bytes for one benchmark config.

    ``kind``: fft (real in, split-complex out), ifft (complex in/out),
    roundtrip (fft + ifft), fft_sequential (same work as fft).
    """
    f32 = 4
    if kind in ("fft", "fft_batch", "fft_sequential", "fft_batchsize", "welch"):
        # welch: (b, n) = (segments, nperseg); the gather/window/mean epilogue
        # is O(bn) and excluded, so the SoL stays a true lower bound.
        flops = transform_flops(b, n, real_input=True)
        bytes_ = b * n * f32 * (1 + 2)  # read x, write (re, im)
    elif kind in ("ifft", "ifft_batch", "ifft_sequential"):
        flops = transform_flops(b, n, real_input=False) + 2.0 * b * n  # 1/N scale
        bytes_ = b * n * f32 * (2 + 2)
    elif kind in (
        "roundtrip",
        "roundtrip_batch",
        "roundtrip_sequential",
        # Analysis ops that are a forward + inverse pair over their (b, n):
        # stft roundtrip over (frames, frame_size), orthonormal dct+idct,
        # hilbert (fft -> gain mask -> ifft), resample (fft@n + ifft@~n).
        "stft_roundtrip",
        "dct_roundtrip",
        "hilbert",
        "resample",
    ):
        flops = (
            transform_flops(b, n, real_input=True)
            + transform_flops(b, n, real_input=False)
            + 2.0 * b * n
        )
        bytes_ = b * n * f32 * (1 + 2)  # x in, (re,im) of the roundtrip out
    elif kind in ("oaconvolve", "fftfilt"):
        # Overlap-add FIR: (b, n) = (blocks, block transform length m).
        # Forward real blocks + spectrum product + inverse complex + 1/m.
        flops = (
            transform_flops(b, n, real_input=True)
            + transform_flops(b, n, real_input=False)
            + 8.0 * b * n
        )
        bytes_ = b * n * f32 * (1 + 1)  # real blocks in, real blocks out
    elif kind == "conv2d":
        # 2-D FFT convolution of ONE image via the one-sided (rfft2) path:
        # (b, n) = padded (m1, m2).  Forward: real rows + complex cols over
        # the n//2+1 surviving bins; inverse: cols over the half-spectrum +
        # full complex rows (Hermitian reconstruction); kernel spectrum
        # amortized.
        hw = n // 2 + 1
        flops = (
            transform_flops(b, n, real_input=True)
            + 2 * transform_flops(hw, b, real_input=False)
            + transform_flops(b, n, real_input=False)
            + 8.0 * b * hw
        )
        bytes_ = b * n * f32 * (1 + 1)
    elif kind == "fft2":
        # b here means H (rows) and n means W: row pass + column pass.
        flops = transform_flops(b, n, real_input=True) + transform_flops(
            n, b, real_input=False
        )
        bytes_ = b * n * f32 * (1 + 2)
    elif kind == "fft_exact":
        # Bluestein: two complex pow2 transforms of length m plus chirp
        # multiplies; b carries the batch, n the (arbitrary) length.
        m = 1
        while m < 2 * n - 1:
            m *= 2
        flops = 2 * transform_flops(b, m, real_input=False) + 3 * 6.0 * b * n
        bytes_ = b * n * f32 * (1 + 2)
    else:
        raise ValueError(f"unknown config kind {kind!r}")
    return {"flops": flops, "bytes": bytes_}


def roofline_row(
    b: int,
    n: int,
    kind: str,
    measured_s: float,
    chip: ChipSpec | None = None,
    precision_passes: int = 6,
) -> dict:
    """%-of-speed-of-light accounting for a measured config.

    ``precision_passes`` is how many bf16 MXU passes realize each f32
    matmul FLOP (6 = Precision.HIGHEST, 3 = error-corrected bf16x3).

    The model is deliberately simple and conservative: pct_sol slightly
    above 100% has been observed (e.g. 110% at B=16 N=65,536), meaning
    XLA's HIGHEST lowering needs fewer effective MXU passes than the
    nominal 6 for some shapes; treat pct_sol as a lower bound on how close
    to the hardware ceiling a config runs, not an exact utilization.
    """
    chip = chip or detect_chip()
    cost = transform_cost(b, n, kind)
    t_bytes = cost["bytes"] / (chip.hbm_gbps * 1e9)
    t_flops = cost["flops"] * precision_passes / (chip.bf16_tflops * 1e12)
    sol = max(t_bytes, t_flops)
    return {
        "flops": cost["flops"],
        "bytes": cost["bytes"],
        "sol_us": sol * 1e6,
        "pct_sol": 100.0 * sol / measured_s if measured_s > 0 else 0.0,
        "bound": "hbm" if t_bytes >= t_flops else "mxu",
        "chip": chip.name,
        "precision_passes": precision_passes,
    }
