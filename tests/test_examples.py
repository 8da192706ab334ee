"""The shipped examples must run end-to-end (rot protection).

The reference treats its examples as de-facto integration tests
(``examples/simple.rs`` prints the documented expected output); these run
the same entry points in-process on the CPU mesh.
"""

import io
import contextlib
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "examples"))


def _run_capturing(mod_main):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        mod_main()
    return buf.getvalue()


def test_simple_example():
    import simple

    out = _run_capturing(simple.main)
    assert "Dominant frequency: 15.04 Hz" in out
    assert "[OK]" in out


def test_backends_example():
    import backends

    out = _run_capturing(backends.main)
    assert "PALLAS" in out and "XLA" in out
    found = 0
    for line in out.splitlines():
        if "roundtrip max error" in line:
            assert float(line.split()[-1]) < 1e-3
            found += 1
    assert found >= 2, f"expected per-backend roundtrip lines, got:\n{out}"


def test_fno_example():
    import fno

    out = _run_capturing(fno.main)
    assert "[OK] antiderivative operator learned" in out
    assert "FNO2d forward: (2, 64, 64, 1) -> (2, 64, 64, 1)" in out


def test_cli_demo():
    from gpu_fft_tpu.__main__ import main

    assert main(["demo"]) == 0
    assert main(["backends"]) == 0


def test_cli_bench_rejects_bad_n(capsys):
    from gpu_fft_tpu.__main__ import main

    assert main(["bench", "-n", "100"]) == 2


def test_cli_plan(capsys):
    from gpu_fft_tpu.__main__ import main

    assert main(["plan", "-n", "1048576"]) == 0
    out = capsys.readouterr().out
    assert "staged" in out and "(128, 8192)" in out
    assert main(["plan", "-n", "100"]) == 2


def test_extensions_example():
    import extensions

    out = _run_capturing(extensions.main)
    assert "60.00 Hz (exact)" in out
    assert "(3, 17)" in out
    assert "OK" in out and "FAIL" not in out


def test_analysis_example():
    import analysis

    out = _run_capturing(analysis.main)
    assert "Welch PSD peak: 125.0 Hz" in out
    assert "[OK]" in out and "FAIL" not in out


def test_filtering_example():
    import filtering

    out = _run_capturing(filtering.main)
    assert "Kaiser lowpass" in out
    assert "[OK]" in out and "FAIL" not in out


def test_api_doc_covers_all_public_symbols():
    # docs/API.md is generated (scripts/gen_api_doc.py); it must mention
    # every public facade symbol so the reference never silently rots.
    import pathlib

    import gpu_fft_tpu as gf

    doc = pathlib.Path(__file__).resolve().parent.parent / "docs" / "API.md"
    text = doc.read_text()
    missing = [n for n in gf.__all__
               if n not in ("utils", "__version__") and f"`{n}" not in text]
    assert not missing, f"regenerate docs/API.md (python scripts/gen_api_doc.py): {missing}"


def test_training_example():
    import training

    out = _run_capturing(training.main)
    assert "OK" in out.splitlines()[-1]
    # the learned 64-tap filter must beat the identity start by >= 5x
    line = [l for l in out.splitlines() if "spectral MSE" in l][0]
    before, after = float(line.split()[2]), float(line.split()[4])
    assert after < before / 5


def test_images_example():
    import images

    out = _run_capturing(images.main)
    assert "[OK]" in out.splitlines()[-1]
    # gaussian blur must soften the sharpest edge by >= 4x
    line = [l for l in out.splitlines() if "sharpest edge" in l][0]
    before, after = float(line.split()[4]), float(line.split()[6])
    assert after < before / 4
