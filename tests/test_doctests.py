"""Run the doc-examples on pure functions as tests.

The reference runs doc-tests on its CPU-pure functions (``src/psd.rs:19-26``,
``src/utils.rs:16-98``); this is the pytest equivalent.  The same modules also
pass ``pytest --doctest-modules gpu_fft_tpu/ops gpu_fft_tpu/utils``.
"""

import doctest

import gpu_fft_tpu.ops.dsp
import gpu_fft_tpu.ops.filter
import gpu_fft_tpu.ops.multirate
import gpu_fft_tpu.ops.spectral
import gpu_fft_tpu.ops.stft
import gpu_fft_tpu.ops.transform
import gpu_fft_tpu.plan
import gpu_fft_tpu.utils.signal


def _run(module, expected_min: int):
    res = doctest.testmod(module, verbose=False)
    assert res.failed == 0, f"{module.__name__}: {res.failed} doctest failures"
    assert res.attempted >= expected_min, (
        f"{module.__name__}: expected at least {expected_min} doc-examples, "
        f"found {res.attempted}"
    )


def test_signal_doctests():
    _run(gpu_fft_tpu.utils.signal, 4)


def test_spectral_doctests():
    _run(gpu_fft_tpu.ops.spectral, 2)


def test_transform_doctests():
    _run(gpu_fft_tpu.ops.transform, 1)


def test_dsp_doctests():
    _run(gpu_fft_tpu.ops.dsp, 5)


def test_filter_doctests():
    _run(gpu_fft_tpu.ops.filter, 4)


def test_multirate_doctests():
    _run(gpu_fft_tpu.ops.multirate, 1)


def test_stft_doctests():
    _run(gpu_fft_tpu.ops.stft, 2)


def test_plan_doctests():
    _run(gpu_fft_tpu.plan, 4)


def test_short_time_fft_doctests():
    import gpu_fft_tpu.ops.short_time_fft

    _run(gpu_fft_tpu.ops.short_time_fft, 4)
