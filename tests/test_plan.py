"""Planning-layer unit tests: factorization, tables, caching."""

import numpy as np
import pytest

from gpu_fft_tpu.config import DIRECT_MAX, FUSED_MAX
from gpu_fft_tpu.kernels.tables import dft_matrix, twiddle_table
from gpu_fft_tpu.ops.transform import next_power_of_two
from gpu_fft_tpu.plan import balanced_split, batch_tile, get_fused_plan


def test_next_power_of_two():
    # Rust usize::next_power_of_two semantics.
    assert next_power_of_two(0) == 1
    assert next_power_of_two(1) == 1
    assert next_power_of_two(2) == 2
    assert next_power_of_two(3) == 4
    assert next_power_of_two(1000) == 1024
    assert next_power_of_two(1024) == 1024
    assert next_power_of_two(1025) == 2048


def test_balanced_split():
    for n in [4, 64, 1024, 4096, 65536, 1 << 20]:
        n1, n2 = balanced_split(n)
        assert n1 * n2 == n
        assert n1 <= n2 <= 2 * n1
    with pytest.raises(ValueError):
        balanced_split(100)


def test_dft_matrix_is_unitary_up_to_n():
    # F(sign=-1) @ F(sign=+1) == n * I.
    n = 64
    fr, fi = dft_matrix(n, -1)
    gr, gi = dft_matrix(n, +1)
    f = fr.astype(np.float64) + 1j * fi
    g = gr.astype(np.float64) + 1j * gi
    prod = f @ g
    assert np.abs(prod - n * np.eye(n)).max() < 1e-3


def test_twiddle_matches_direct_exp():
    t_r, t_i = twiddle_table(8, 16, 128, -1)
    a, b = np.meshgrid(np.arange(8), np.arange(16), indexing="ij")
    ref = np.exp(-2j * np.pi * a * b / 128)
    assert np.abs(t_r - ref.real).max() < 1e-6
    assert np.abs(t_i - ref.imag).max() < 1e-6


def test_plan_kinds():
    assert get_fused_plan(DIRECT_MAX, -1).kind == "direct"
    assert get_fused_plan(DIRECT_MAX * 2, -1).kind == "fourstep"
    assert get_fused_plan(FUSED_MAX, -1).kind == "fourstep"
    with pytest.raises(ValueError):
        get_fused_plan(FUSED_MAX * 2, -1)
    with pytest.raises(ValueError):
        get_fused_plan(100, -1)
    with pytest.raises(ValueError):
        get_fused_plan(64, 2)


def test_plan_cached():
    assert get_fused_plan(256, -1) is get_fused_plan(256, -1)


def test_batch_tile_bounds():
    for n in [64, 1024, 65536]:
        for cx in (False, True):
            bt = batch_tile(n, cx)
            assert 1 <= bt <= 512
            assert bt & (bt - 1) == 0  # power of two


def test_device_api_rejects_native_backend():
    import numpy as np
    import pytest as _pytest

    from gpu_fft_tpu import Backend, fft_device, ifft_device

    x = np.zeros(16, np.float32)
    with _pytest.raises(ValueError):
        fft_device(x, backend=Backend.NATIVE)
    with _pytest.raises(ValueError):
        ifft_device(x, x, backend=Backend.NATIVE)


def test_ifft_device_rejects_mismatched_shapes():
    import numpy as np
    import pytest as _pytest

    from gpu_fft_tpu import ifft_device

    with _pytest.raises(ValueError):
        ifft_device(np.zeros(8, np.float32), np.zeros((2, 8), np.float32))


def test_warmup():
    import pytest as _pytest

    import gpu_fft_tpu as gf

    gf.warmup(sizes=(64,), batches=(1, 2))
    with _pytest.raises(ValueError):
        gf.warmup(sizes=(100,))
