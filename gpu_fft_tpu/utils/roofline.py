"""Roofline accounting: calibrated FLOPs, bytes, and speed-of-light per config.

The repo's north star (BASELINE.json) is stated as a fraction of roofline, so
the bench artifacts must *compute* that fraction honestly.  Round 2's model
assumed a nominal 6 bf16 MXU passes for every f32 matmul and promptly read
115% of speed-of-light on one config — an instrument that overshoots 100%
cannot certify the >=80% target (round-2 verdict item 2).  Round 3 replaces
the nominal model with MEASURED components (scripts/calibrate_matmul.py,
v5e 2026-08):

* ``EFF_PASSES`` — effective bf16 passes per f32 matmul, by contraction
  class K, from bare chained ``z @ W`` dots at HIGHEST.  K >= 128 runs at
  ~6.0-6.3 passes (the nominal 6 + epilogue); K = 64 at ~11, K = 32 at ~28:
  contractions shallower than the 128-deep systolic array idle most of it.
  The bare dot IS speed-of-light for a matmul-factored FFT — nothing on the
  chip runs the plan's dot products faster than a lone dot.
* ``onchip_gbps`` / ``onchip_mb`` — measured streaming bandwidth for
  working sets that stay on chip (~4.7 TB/s up to ~32 MB on v5e) vs the
  HBM stream rate beyond (~610-630 GB/s measured at 128 MB, below the
  819 GB/s spec).  Configs whose tensors fit on chip are NOT HBM-bound.
* ``vpu_tflops`` — approximate elementwise throughput, charging the
  twiddle/recombination epilogues that the MXU model ignores.

``sol = max(t_bytes, t_mxu, t_vpu)`` with per-stage contraction classes
mirrored from the live plan (``plan.py`` / ``kernels/large.py``), so
``pct_sol = sol / measured`` reads how close a measurement is to what bare
dots + bare streams of the SAME plan could do; ``bound`` names the wall.

Measurement error bars: the calibration rows carry <=6% IQR (re-measured
rows <=2%); quote pct_sol as +-6% relative.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..config import DIRECT_MAX, FUSED_MAX

__all__ = [
    "ChipSpec",
    "detect_chip",
    "transform_cost",
    "roofline_row",
    "CHIPS",
    "EFF_PASSES",
    "eff_passes",
    "CALIBRATED_CHIPS",
    "chip_calibrated",
    "count_kernels",
    "compiled_stats",
]


@dataclass(frozen=True)
class ChipSpec:
    name: str
    hbm_gbps: float  # HBM stream bandwidth, GB/s (measured where calibrated)
    bf16_tflops: float  # MXU peak, bf16 TFLOP/s (published spec)
    vpu_tflops: float  # elementwise f32 throughput, TFLOP/s (approximate)
    onchip_gbps: float | None  # measured on-chip stream bw (None = uncalibrated)
    onchip_mb: float  # working-set size that stays on chip
    # Per-iteration kernel-launch floor inside a chained program:
    # t_latency = launch_base_us + launch_per_kernel_us * n_kernels, fit on
    # controlled matmul chains (scripts/calibrate_latency.py, v5e 2026-08:
    # 0.351 + 0.078/kernel over 3..40 fusions, residual < 0.3 us).  None =
    # uncalibrated (no latency term — the other walls still bound).
    launch_base_us: float | None = None
    launch_per_kernel_us: float | None = None
    # Per-Mosaic-kernel (pallas_call custom-call) dispatch floor, measured
    # by the chained pallas probes (scripts/calibrate_latency.py + the
    # §24 operand probe, v5e 2026-08): a minimal 1-operand copy
    # pallas_call costs 0.384 us/call (vs 0.370 for the same-shape
    # fusion — dispatch itself is nearly free), the SECOND operand adds
    # +0.45 us (operand DMA issue serializes with kernel start), each
    # further operand ~+0.098 us.  t_pallas(ops) = pallas_call_us for
    # ops <= 1, else pallas_two_operand_us +
    # pallas_per_extra_operand_us * (ops - 2); charged instead of the
    # fusion rate for each custom call, so Pallas rows read against
    # their measured dispatch+DMA-issue floor (in-kernel dot
    # serialization remains uncharged — the wall stays a lower bound).
    pallas_call_us: float | None = None
    pallas_two_operand_us: float | None = None
    pallas_per_extra_operand_us: float | None = None


CHIPS = {
    # v5e: hbm/onchip/vpu/launch measured in this repo
    # (scripts/calibrate_matmul.py, scripts/calibrate_latency.py + the
    # bandwidth probes, 2026-08); bf16 peak is the published spec.
    "v5e": ChipSpec("v5e", 620.0, 197.0, 4.0, 4700.0, 32.0, 0.35, 0.078, 0.384, 0.836, 0.098),
    # Other generations: published specs; on-chip numbers transferred from
    # v5e by HBM ratio (UNCALIBRATED — re-run scripts/calibrate_matmul.py
    # + scripts/calibrate_latency.py on hardware).  The launch floor is
    # runtime-dominated rather than clock-dominated, so the v5e fit
    # transfers as an estimate but stays un-certified.
    "v5p": ChipSpec("v5p", 2765.0, 459.0, 7.0, 4700.0 * 2765.0 / 819.0, 32.0, 0.35, 0.078),
    "v4": ChipSpec("v4", 1228.0, 275.0, 4.0, 4700.0 * 1228.0 / 819.0, 32.0, 0.35, 0.078),
    "v6e": ChipSpec("v6e", 1640.0, 918.0, 8.0, 4700.0 * 1640.0 / 819.0, 32.0, 0.35, 0.078),
    # CPU fallback so the accounting stays defined on the test mesh; the
    # numbers are order-of-magnitude only and flagged by the name.
    "cpu-approx": ChipSpec("cpu-approx", 50.0, 1.0, 0.1, None, 0.0),
}

#: Chips whose FULL instrument (EFF_PASSES + bandwidth + launch floor) was
#: measured on hardware in this repo.  Everything else reads a transferred
#: model: bench.py marks such rows ``calibrated: false`` and refuses the
#: north-star verdict (run scripts/calibrate_chip.py + calibrate_matmul.py
#: + calibrate_latency.py on the target chip to promote it).
CALIBRATED_CHIPS = frozenset({"v5e"})


def chip_calibrated(chip: "ChipSpec") -> bool:
    return chip.name in CALIBRATED_CHIPS


# Effective bf16 MXU passes per f32 HIGHEST matmul, by contraction class —
# measured on v5e (scripts/calibrate_matmul.py, 2026-08) as the MARGINAL
# bare-dot cost (two chain depths differenced, so loop-carry and boundary
# traffic cancel), then RATCHETED down wherever a real composed config
# implies a faster per-class rate — the instrument must lower-bound every
# achievable execution, and XLA's in-context scheduling of the (16, 65536)
# four-step (71.5 us best over rounds for 2.68 GFLOP of K=256 dots)
# implies ~5.2 effective passes where every bare chain measures 6.0-6.35;
# the K=256 entry carries a further safety margin for run dispersion.
# K=128 ratcheted the same way in round 3: a real (16, 16384) four-step
# sweep row (two K=128 stages, 335.5 MFLOP) measured 9.31 us median — the
# bare-chain 6.11 passes would bound it at 10.41 us (112% SoL), so the
# composed schedule achieves <= 5.46 passes/dot; 5.3 carries the margin.
# Shared-operand pairs and Karatsuba triples calibrate within 4% of the
# singles (patterns row of scripts/calibrate_matmul.py), so one value per
# class suffices.  The K-dependence is 128x128 systolic-array geometry,
# identical across v4/v5e/v5p/v6e, so the v5e row transfers;
# re-calibrate to promote.
EFF_PASSES = {
    "v5e": {32: 26.8, 64: 14.6, 128: 5.3, 256: 5.0, 512: 5.92},
}
_EFF_DEFAULT = EFF_PASSES["v5e"]


def eff_passes(chip_name: str, k: int) -> float:
    """Measured effective passes for a contraction of size k (nearest class)."""
    table = EFF_PASSES.get(chip_name, _EFF_DEFAULT)
    key = min(table, key=lambda c: abs(c - k) / c)
    return table[key]


def compiled_stats(step, x0) -> dict:
    """Kernel count + content fingerprint of ``jit(step)(x0)``'s compiled
    module.

    ``n_kernels`` counts fusion computations plus TPU custom calls (Pallas
    kernels) in the compiled HLO — each is one device kernel launch per
    iteration, the unit the launch-floor model charges.  ``fingerprint``
    is a sha256 prefix of the compiled HLO text: two rounds with the same
    fingerprint run the IDENTICAL program, so a timing delta between them
    is environment drift by construction, not a code regression (the
    regression gate uses this to reclassify IQR-exceeding deltas —
    round-4 welch study, docs/ABLATION.md §21).  Compilation rides the
    persistent cache, so repeat bench runs pay nothing.
    """
    import hashlib
    import re

    import jax

    txt = jax.jit(step).lower(x0).compile().as_text()
    fusions = len(re.findall(r"^\s*(?:ROOT )?%?fusion", txt, re.M))
    # Per-custom-call operand counts: the §24 probe showed operand DMA
    # issue serializes with kernel start (~+0.45 us for the second
    # operand, ~+0.098 us each after), so the latency wall needs the
    # count, not just the call.
    pallas_ops = [
        len(re.findall(r"%[\w.-]+", m.group(1)))
        for m in re.finditer(
            r"custom-call\(([^)]*)\)[^\n]*tpu_custom_call", txt
        )
    ]
    return {
        "n_kernels": fusions + len(pallas_ops),
        "n_pallas": len(pallas_ops),
        "pallas_operands": pallas_ops,
        "fingerprint": hashlib.sha256(txt.encode()).hexdigest()[:16],
    }


def count_kernels(step, x0) -> int:
    """Kernel count of ``jit(step)(x0)``'s compiled module (see
    :func:`compiled_stats`)."""
    return compiled_stats(step, x0)["n_kernels"]


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


def _pack_applies(b: int, n: int) -> bool:
    from ..plan import rfft_pack_applies

    return rfft_pack_applies(b, n)


def _half_applies(n: int) -> bool:
    from ..plan import half_spectrum_applies

    return half_spectrum_applies(n)


def _whole_applies(b: int, n: int) -> bool:
    from ..plan import whole_kernel_applies

    return whole_kernel_applies(b, n)


def transform_stages(b: int, n: int, real_input: bool):
    """Per-matmul-stage (flops, contraction) list + elementwise flops.

    Mirrors the live dispatch (``kernels/large.py:transform_any``): the
    real-input packing gate, direct/fourstep/staged planning, and the
    Karatsuba 3-dot complex matmuls.  A real matmul (m, k) @ (k, j) counts
    2*m*k*j; a complex elementwise multiply 6 flops/element.
    """
    if real_input and n >= 8 and _pack_applies(b, n):
        stages, elem = transform_stages(b, n // 2, real_input=False)
        # Packed recombination: mirror/E/O/T/X epilogue, ~8 flops per
        # original element (14-16 VPU ops per half element).
        return stages, elem + 8.0 * b * n
    if DIRECT_MAX < n <= FUSED_MAX and _whole_applies(b, n):
        # Whole-transform single Pallas kernel (kernels/fused.py:
        # whole_transform; gate = tuning.whole_*): fixed n2 = 128 lane
        # split, stage 1 contracts n1 = n/128 (2 real / 3 Karatsuba
        # dots), stage 2 contracts the 128 lanes (3 dots), one in-VMEM
        # twiddle cmul between.  Table DMA is charged to the latency
        # wall's pallas floor, not bytes (lower bound preserved).
        n1 = n // 128
        if real_input:
            return [(2 * 2.0 * b * n * n1, n1), (3 * 2.0 * b * n * 128, 128)], 6.0 * b * n
        return [(3 * 2.0 * b * n * n1, n1), (3 * 2.0 * b * n * 128, 128)], 6.0 * b * n
    if n <= DIRECT_MAX:
        if real_input:
            return [(2 * 2.0 * b * n * n, n)], 0.0
        return [(3 * 2.0 * b * n * n, n)], 7.0 * b * n
    if n <= FUSED_MAX:
        if real_input and _half_applies(n):
            # Hermitian half-spectrum route (kernels/fused_jnp.py:
            # fused_fft_jnp_half): balanced split, full first stage, then
            # only h = n1/2 + 1 k1-rows survive — the second matmul, the
            # twiddle and the stage-2 epilogue all scale by h/n1; one
            # rev+concat mirror epilogue (~2 flops/elem charged).
            from ..plan import balanced_split

            n1, n2 = balanced_split(n)
            frac = (n1 // 2 + 1) / n1
            stages = [
                (2 * 2.0 * b * n * n1, n1),
                (3 * 2.0 * b * n * n2 * frac, n2),
            ]
            elem = (6.0 + 5.0) * b * n * frac + 2.0 * b * n
            return stages, elem
        n1, n2 = _fused_split(n, b)
        stages = []
        if real_input:
            stages.append((2 * 2.0 * b * n * n1, n1))
            elem = 6.0 * b * n
        else:
            stages.append((3 * 2.0 * b * n * n1, n1))
            elem = 6.0 * b * n + 5.0 * b * n
        stages.append((3 * 2.0 * b * n * n2, n2))
        elem += 5.0 * b * n
        return stages, elem
    n1 = _stage_a_n1(n)
    n2 = n // n1
    half = real_input and _half_applies(n)
    # Row-limited stage A (kernels/fused.py:stage_a rows=...): the real
    # staged half path computes only ceil-to-sublane(n1/2 + 1) k1 rows.
    frac_a = (-(-(n1 // 2 + 1) // 8) * 8) / n1 if half else 1.0
    if real_input:
        stages = [(2 * 2.0 * b * n * n1 * frac_a, n1)]
        elem = 6.0 * b * n * frac_a
    else:
        stages = [(3 * 2.0 * b * n * n1, n1)]
        elem = 6.0 * b * n + 5.0 * b * n
    s2, e2 = transform_stages(b * n1, n2, real_input=False)
    if half:
        # Staged half route (stage_b_half_jnp): the k1 axis is sliced to
        # h = n1/2 + 1 rows before stage B, so every stage-B matmul and
        # epilogue scales by h/n1, plus the mirror.
        frac = (n1 // 2 + 1) / n1
        s2 = [(f * frac, k) for f, k in s2]
        e2 = e2 * frac + 2.0 * b * n
    return stages + s2, elem + e2


def irfft_stages(b: int, n: int):
    """Stage list for the real-OUTPUT inverse (``kernels/large.py:
    inverse_real``), mirroring its dispatch: the fused Hermitian fold at
    irfft_half_min <= n <= FUSED_MAX, the half-column stage A + per-row
    stage-B fold at n >= irfft_half_staged_min, and the full complex
    inverse + drop-imag otherwise.  Returns (stages, elem_flops,
    read_fraction) — the fold reads only its kept fraction of the input
    spectrum, which the byte charge must reflect to keep pct_sol <= 100.
    """
    from ..plan import balanced_split, irfft_half_applies, irfft_half_staged_applies

    if n <= FUSED_MAX and n >= 16 and irfft_half_applies(n):
        n1, n2 = balanced_split(n)
        h1 = n1 // 2 + 1
        stages = [
            # Stage 1: Karatsuba complex contraction of k2 over h1 columns.
            (3 * 2.0 * b * h1 * n2 * n2, n2),
            # Stage 2: two REAL einsums contracting n1/2, natural order out.
            (2 * 2.0 * b * n * (n1 // 2), n1 // 2),
        ]
        elem = 6.0 * b * h1 * n2 + 2.0 * b * n  # twiddle + Nyquist broadcast
        return stages, elem, h1 / n1
    if n > FUSED_MAX and irfft_half_staged_applies(n):
        n1 = _stage_a_n1(n)
        n2 = n // n1
        from ..plan import stage_a_col_tile

        ct = stage_a_col_tile(n1, n2)
        w = -(-(n2 // 2 + 1) // ct) * ct  # computed stage-A columns
        P, q = n2 // 128, 128
        h = q // 2 + 1
        stages = [
            # Half-column complex stage A (Karatsuba).
            (3 * 2.0 * b * n1 * n1 * w, n1),
            # Per-row stage-B fold: complex stage 1 over h of q minor cols.
            (3 * 2.0 * b * n1 * h * P * P, P),
            # Real-only stage 2 contracting q/2.
            (2 * 2.0 * b * n * (q // 2), q // 2),
        ]
        # stage-A twiddle + fold-input reversal passes + row twiddle.
        elem = 6.0 * b * n1 * w + 2.0 * b * n + 6.0 * b * n1 * h * P
        return stages, elem, w / n2
    stages, elem = transform_stages(b, n, real_input=False)
    return stages, elem, 1.0


def transform_flops(b: int, n: int, real_input: bool) -> float:
    """Total algorithm FLOPs (matmul + elementwise) of one planned transform."""
    stages, elem = transform_stages(b, n, real_input)
    return sum(f for f, _ in stages) + elem


def transform_cost(b: int, n: int, kind: str = "fft") -> dict:
    """FLOPs + speed-of-light bytes + per-stage classes for one config.

    ``kind``: fft (real in, split-complex out), ifft (complex in/out),
    roundtrip (fft + ifft), fft_sequential (same work as fft), plus the
    analysis-op kinds (see the table below).
    """
    f32 = 4

    def parts(*specs):
        stages: list = []
        elem = 0.0
        for bb, nn, real in specs:
            s, e = transform_stages(bb, nn, real)
            stages += s
            elem += e
        return stages, elem

    if kind in ("fft", "fft_batch", "fft_sequential", "fft_batchsize", "welch"):
        # welch: (b, n) = (segments, nperseg); the window/mean epilogue is
        # O(bn) and excluded, so the SoL stays a true lower bound.
        stages, elem = parts((b, n, True))
        bytes_ = b * n * f32 * (1 + 2)  # read x, write (re, im)
    elif kind in ("ifft", "ifft_batch", "ifft_sequential"):
        stages, elem = parts((b, n, False))
        elem += 2.0 * b * n  # 1/N scale
        bytes_ = b * n * f32 * (2 + 2)
    elif kind == "irfft":
        # Real-output inverse (inverse_real): Hermitian-fold dispatch; the
        # fold reads only its kept fraction of the spectrum and the 1/N
        # scale lives in the plan tables (no extra pass).
        stages, elem, read_frac = irfft_stages(b, n)
        bytes_ = b * n * f32 * (2.0 * read_frac + 1)
    elif kind in (
        "roundtrip",
        "roundtrip_batch",
        "roundtrip_sequential",
        # Analysis ops that are a forward + inverse pair over their (b, n):
        # hilbert (fft -> gain mask -> ifft; the analytic output is genuinely
        # complex, so the inverse leg is the full complex transform).
        "hilbert",
        # grad_fft: reverse-mode spectrum-power gradient = the forward
        # transform + its transpose (conj . T . conj — one full COMPLEX
        # transform via the linear_call seam, kernels/large.py) + an O(bn)
        # epilogue — a roundtrip's compute, so the roundtrip model is its
        # speed-of-light.
        "grad_fft",
    ):
        stages, elem = parts((b, n, True), (b, n, False))
        elem += 2.0 * b * n
        bytes_ = b * n * f32 * (1 + 2)  # x in, (re,im) of the roundtrip out
    elif kind == "dct_roundtrip":
        # Orthonormal dct+idct (ops/dct.py): Makhoul forward = real FFT @ n
        # + rotation; DCT-III inverse rides the real-OUTPUT inverse dispatch
        # (kernels/large.py:inverse_real — full complex below irfft_half_min,
        # Hermitian fold above), so the inverse leg is the irfft charge.
        # The permutation matmuls are pure data movement (a zero-FLOP
        # permutation in principle), so they are not charged — the SoL stays
        # a true lower bound.
        stages, elem = parts((b, n, True))
        s2, e2, _ = irfft_stages(b, n)
        stages += s2
        elem += e2 + 4.0 * b * n  # pre/post rotations
        bytes_ = b * n * f32 * (1 + 2)
    elif kind == "resample":
        # The benched step is resample(resample(x, n/2), n) — down then back
        # up: real forward @ n, one-sided inverse @ n/2, real forward @ n/2,
        # one-sided inverse @ n (ops/dsp.py:resample_device rides
        # inverse_real_half for pow2 targets).  Spectrum surgery is O(bn) VPU.
        mid = n // 2
        stages, elem = parts((b, n, True), (b, mid, True))
        for target in (mid, n):
            s2, e2, _ = irfft_stages(b, target)
            stages += s2
            elem += e2
        elem += 4.0 * b * n
        bytes_ = b * n * f32 * (1 + 1)
    elif kind == "stft_roundtrip":
        # STFT analysis + synthesis over (frames, frame_size): forward real
        # frames, then the one-sided inverse (istft -> irfft_device ->
        # inverse_real_half).  At direct frame sizes the inverse is two real
        # dots contracting h = n//2 + 1 bins (the Hermitian fold lives in
        # the tables); larger frames mirror + run the fold dispatch, the
        # same charge as a full roundtrip.
        if n <= DIRECT_MAX:
            stages, elem = parts((b, n, True))
            h = n // 2 + 1
            # Direct inverse leg: the K=128 lane-exact variant (K = n/2
            # dots + Nyquist broadcast) when its gate is on, else the
            # h-deep fold (kernels/large.py:inverse_real_half).
            from ..tuning import get_tuning

            if n >= 256 and get_tuning().irfft_direct_k128:
                stages.append((2 * 2.0 * b * n * (n // 2), n // 2))
            else:
                stages.append((2 * 2.0 * b * n * h, h))
            # window multiply + overlap-add accumulation + WOLA division.
            elem += 4.0 * b * n
        else:
            stages, elem = parts((b, n, True), (b, n, False))
            elem += 2.0 * b * n
        bytes_ = b * n * f32 * (1 + 2)
    elif kind in ("oaconvolve", "fftfilt"):
        # Overlap-add FIR: (b, n) = (blocks, block transform length m).
        # Forward real blocks + spectrum product + inverse complex + 1/m.
        stages, elem = parts((b, n, True), (b, n, False))
        elem += 8.0 * b * n
        bytes_ = b * n * f32 * (1 + 1)  # real blocks in, real blocks out
    elif kind == "conv2d":
        # 2-D FFT convolution of ONE image via the one-sided (rfft2) path:
        # (b, n) = padded (m1, m2).  Forward: real rows + complex cols over
        # the n//2+1 surviving bins; inverse: cols over the half-spectrum +
        # full complex rows (Hermitian reconstruction); kernel spectrum
        # amortized.
        hw = n // 2 + 1
        stages, elem = parts((b, n, True), (hw, b, False), (hw, b, False))
        if n <= DIRECT_MAX:
            # Row inverse from the one-sided bins: irfft_device ->
            # inverse_real_half = two real dots contracting hw (the
            # Hermitian fold lives in the tables).
            stages.append((2 * 2.0 * b * n * hw, hw))
        else:
            s2, e2 = parts((b, n, False))
            stages += s2
            elem += e2
        elem += 8.0 * b * hw
        bytes_ = b * n * f32 * (1 + 1)
    elif kind == "fft2":
        # b here means H (rows) and n means W: row pass + column pass.
        stages, elem = parts((b, n, True), (n, b, False))
        bytes_ = b * n * f32 * (1 + 2)
    elif kind == "fft_exact":
        # Exact non-pow2 dispatch (ops/exact.py): mixed-radix four-step
        # (two direct-digit matmuls + twiddle; real input skips the first
        # stage's third dot) when a balanced divisor pairing wins on
        # modeled FLOPs, else Bluestein's two complex pow2 transforms of
        # length m plus chirp multiplies.  b carries the batch, n the
        # (arbitrary) length.
        from ..ops.exact import mixed_split

        sp = mixed_split(n)
        if sp is not None:
            n1, n2 = sp
            stages = [
                (2 * 2.0 * b * n * n1, n1),  # real input: two stage-1 dots
                (3 * 2.0 * b * n * n2, n2),
            ]
            elem = 6.0 * b * n  # twiddle
        else:
            m = 1
            while m < 2 * n - 1:
                m *= 2
            stages, elem = parts((b, m, False), (b, m, False))
            elem += 3 * 6.0 * b * n
        bytes_ = b * n * f32 * (1 + 2)
    else:
        raise ValueError(f"unknown config kind {kind!r}")
    return {
        "flops": sum(f for f, _ in stages) + elem,
        "bytes": bytes_,
        "stages": stages,
        "elem_flops": elem,
    }


def roofline_row(
    b: int,
    n: int,
    kind: str,
    measured_s: float,
    chip: ChipSpec | None = None,
    precision_passes: int | None = None,
    n_kernels: int | None = None,
    n_pallas: int | None = None,
    pallas_operands: list | None = None,
) -> dict:
    """Calibrated %-of-speed-of-light accounting for a measured config.

    ``t_mxu`` charges each matmul stage its MEASURED effective pass count
    for its contraction class (EFF_PASSES); ``t_bytes`` uses the measured
    on-chip stream rate when the config's tensors fit on chip, the measured
    HBM rate otherwise; ``t_vpu`` charges elementwise epilogues.  ``sol``
    is the max of the three — a lower bound achievable by bare dots and
    bare streams of the same plan, so pct_sol <= 100 within the
    calibration's ~6% error bars.

    ``precision_passes`` optionally scales the MXU model for reduced
    precision modes (3 = bf16x3 "high", 1 = raw bf16); None = the
    calibrated HIGHEST model.

    ``n_kernels`` — the MEASURED kernel (fusion) count of the config's
    compiled step, when the caller has it (bench.py counts the fusions in
    the compiled HLO).  Adds the launch-floor wall
    ``t_latency = launch_base + launch_per_kernel * n_kernels`` so small-N
    rows read honestly: a 2.4 us n=1024 transform is 12 kernel launches at
    ~0.2 us each, not "2% of an MXU bound" (round-3 verdict weak item 3).
    """
    chip = chip or detect_chip()
    cost = transform_cost(b, n, kind)
    fits = chip.onchip_gbps is not None and cost["bytes"] <= chip.onchip_mb * 1e6
    bw = chip.onchip_gbps if fits else chip.hbm_gbps
    t_bytes = cost["bytes"] / (bw * 1e9)
    scale = 1.0 if precision_passes is None else precision_passes / 6.0
    t_mxu = sum(
        f * eff_passes(chip.name, k) * scale for f, k in cost["stages"]
    ) / (chip.bf16_tflops * 1e12)
    t_vpu = cost["elem_flops"] / (chip.vpu_tflops * 1e12)
    walls = {"onchip" if fits else "hbm": t_bytes, "mxu": t_mxu, "vpu": t_vpu}
    if (
        n_kernels is not None
        and chip.launch_base_us is not None
        and chip.launch_per_kernel_us is not None
    ):
        t_lat_us = chip.launch_base_us + chip.launch_per_kernel_us * n_kernels
        if n_pallas and chip.pallas_call_us is not None:
            # Each Mosaic custom call pays the measured pallas
            # dispatch + operand-DMA-issue floor (§24 probe:
            # t_pallas(ops) = 0.384 / 0.836 + 0.098*(ops-2)) instead of
            # the (much cheaper) fusion rate it was already charged in
            # the fit above.
            ops_list = pallas_operands or [1] * n_pallas

            def t_pallas(ops: int) -> float:
                if ops <= 1 or chip.pallas_two_operand_us is None:
                    return chip.pallas_call_us
                return chip.pallas_two_operand_us + (
                    chip.pallas_per_extra_operand_us or 0.0
                ) * max(0, ops - 2)

            t_lat_us += sum(
                max(0.0, t_pallas(ops) - chip.launch_per_kernel_us)
                for ops in ops_list
            )
        walls["latency"] = t_lat_us * 1e-6
    bound = max(walls, key=walls.get)
    sol = walls[bound]
    row = {
        "flops": cost["flops"],
        "bytes": cost["bytes"],
        "sol_us": sol * 1e6,
        "pct_sol": 100.0 * sol / measured_s if measured_s > 0 else 0.0,
        "bound": bound,
        "chip": chip.name,
        "model": "calibrated-v5e" if chip_calibrated(chip) else "transferred-v5e",
        "calibrated": chip_calibrated(chip),
        "pct_sol_rel_err": 0.06,
    }
    if n_kernels is not None:
        row["n_kernels"] = n_kernels
        if n_pallas is not None:
            row["n_pallas"] = n_pallas
        if pallas_operands:
            row["pallas_operands"] = list(pallas_operands)
        if "latency" in walls:
            row["t_latency_us"] = walls["latency"] * 1e6
    return row
