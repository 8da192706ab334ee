"""Roofline accounting tests (utils/roofline.py, SURVEY §5 metrics)."""

import numpy as np
import pytest

from gpu_fft_tpu.utils import roofline


def test_transform_cost_direct_vs_fused():
    # Direct (n <= 512): real input = 2 matmuls of n x n over b rows.
    c = roofline.transform_cost(8, 256, "fft")
    assert c["flops"] == pytest.approx(2 * 2.0 * 8 * 256 * 256)
    assert c["bytes"] == 8 * 256 * 4 * 3
    assert c["stages"] == [(2 * 2.0 * 8 * 256 * 256, 256)]
    # Fused four-step FLOPs scale ~ n*(n1+n2), far below direct's n^2.
    # Real input at n >= half_spectrum_min rides the Hermitian half route:
    # full first stage, second matmul / twiddle / epilogue scaled by
    # h/n1 = (n1/2 + 1)/n1, plus the ~2 flops/elem mirror.
    c2 = roofline.transform_cost(1, 65536, "fft")
    assert c2["flops"] < 2 * 2.0 * 65536 * 65536
    n1, n2 = 256, 256
    frac = (n1 // 2 + 1) / n1
    expected = (
        2 * 2.0 * 65536 * n1
        + 3 * 2.0 * 65536 * n2 * frac
        + (6.0 + 5.0) * 65536 * frac
        + 2.0 * 65536
    )
    assert c2["flops"] == pytest.approx(expected)
    assert [k for _, k in c2["stages"]] == [n1, n2]
    # Below the gate (and for complex input) the full-spectrum model holds.
    cfull = roofline.transform_cost(1, 65536, "ifft")
    assert cfull["stages"][1][0] == pytest.approx(3 * 2.0 * 65536 * n2)
    # (1, 16384) rides the whole-transform single kernel (round 5,
    # tuning.whole_*): same [n1, 128] stage classes, one in-kernel twiddle
    # cmul (6 flops/elem) and no separate digit-reversal epilogue.
    c3 = roofline.transform_cost(1, 16384, "fft")
    assert [k for _, k in c3["stages"]] == [128, 128]
    assert c3["flops"] == pytest.approx(
        2 * 2.0 * 16384 * 128 + 3 * 2.0 * 16384 * 128 + 6.0 * 16384
    )
    # Above the whole-kernel batch gate the XLA-scheduled fused model holds.
    c4 = roofline.transform_cost(2, 16384, "fft")
    assert [k for _, k in c4["stages"]] == [128, 128]
    assert c4["flops"] == pytest.approx(
        2 * (2 * 2.0 * 16384 * 128 + 3 * 2.0 * 16384 * 128 + (6.0 + 5.0) * 16384)
    )


def test_transform_cost_mirrors_packing_gate(monkeypatch):
    # When the (currently disabled) real-input packing gate is on, the cost
    # model mirrors the packed plan: one n/2 complex transform + O(n) elem.
    from gpu_fft_tpu import plan as plan_mod

    monkeypatch.setattr(plan_mod, "rfft_pack_applies", lambda b, n: True)
    c2 = roofline.transform_cost(1, 65536, "fft")
    h, h1, h2 = 32768, 128, 256
    mm = 3 * 2.0 * h * h1 + 3 * 2.0 * h * h2
    expected = mm + (6.0 + 5.0 + 5.0) * h + 8.0 * 65536
    assert c2["flops"] == pytest.approx(expected)
    assert [k for _, k in c2["stages"]] == [h1, h2]


def test_eff_passes_classes():
    # Calibrated shape classes: K >= 128 near-nominal, small K penalized.
    assert roofline.eff_passes("v5e", 128) == pytest.approx(5.3)
    assert roofline.eff_passes("v5e", 64) == pytest.approx(14.6)
    assert roofline.eff_passes("v5e", 200) == pytest.approx(5.0)  # nearest 256
    # Unknown chips transfer the v5e table (same MXU geometry).
    assert roofline.eff_passes("v5p", 128) == pytest.approx(5.3)


def test_large_n_recursion_counts_both_stages():
    c = roofline.transform_cost(1, 1 << 20, "fft")
    assert c["flops"] > roofline.transform_cost(1, 65536, "fft")["flops"]
    assert np.isfinite(c["flops"])


def test_roundtrip_cost_exceeds_forward():
    fwd = roofline.transform_cost(1, 4096, "fft")["flops"]
    rt = roofline.transform_cost(1, 4096, "roundtrip")["flops"]
    assert rt > fwd


def test_roofline_row_fields_and_bounds():
    row = roofline.roofline_row(1, 65536, "fft", measured_s=10e-6, chip=roofline.CHIPS["v5e"])
    assert row["bound"] in ("hbm", "onchip", "mxu", "vpu")
    assert 0 < row["pct_sol"] <= 100.0 or row["pct_sol"] > 0  # finite, positive
    assert row["sol_us"] > 0
    assert row["model"] == "calibrated-v5e"
    assert row["pct_sol_rel_err"] == pytest.approx(0.06)
    # SoL can never exceed the measured time by definition of pct.
    assert row["pct_sol"] == pytest.approx(100.0 * row["sol_us"] / 10.0)


def test_roofline_row_onchip_vs_hbm_stream():
    # A config whose tensors fit on chip must NOT be charged HBM rates.
    small = roofline.roofline_row(1, 65536, "fft", 1e-6, chip=roofline.CHIPS["v5e"])
    assert small["bound"] != "hbm"
    # A config far beyond the on-chip capacity streams from HBM.
    big = roofline.roofline_row(64, 1 << 20, "fft", 1e-3, chip=roofline.CHIPS["v5e"])
    cost = roofline.transform_cost(64, 1 << 20, "fft")
    assert cost["bytes"] > 32e6


def test_detect_chip_runs():
    chip = roofline.detect_chip()
    assert chip.hbm_gbps > 0 and chip.bf16_tflops > 0


def test_unknown_kind_raises():
    with pytest.raises(ValueError):
        roofline.transform_cost(1, 1024, "nope")


def test_extension_kinds():
    c2 = roofline.transform_cost(256, 512, "fft2")
    assert c2["flops"] > roofline.transform_cost(256, 512, "fft")["flops"]
    ce = roofline.transform_cost(1, 48000, "fft_exact")
    # Bluestein pays two 131072-point complex transforms.
    assert ce["flops"] > 2 * roofline.transform_cost(1, 1 << 17, "fft")["flops"] * 0.5
    assert np.isfinite(ce["flops"]) and ce["bytes"] == 48000 * 4 * 3


def test_filter_kinds():
    oa = roofline.transform_cost(64, 4096, "oaconvolve")
    rt = roofline.transform_cost(64, 4096, "roundtrip")
    assert oa["flops"] > rt["flops"]  # roundtrip + spectrum product
    assert oa["bytes"] == 64 * 4096 * 4 * 2
    c2 = roofline.transform_cost(512, 512, "conv2d")
    f2 = roofline.transform_cost(512, 512, "fft2")
    # One-sided path: fwd rfft2 + inverse ~ 1.2x one full 2-D pass (the
    # row inverse is the direct half-input fold at n <= DIRECT_MAX —
    # two real dots contracting n/2 + 1).
    assert f2["flops"] * 1.1 < c2["flops"] < f2["flops"] * 2.0
