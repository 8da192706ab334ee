"""DSP convenience ops: rfft/irfft, fft_convolve, shifts (numpy oracles)."""

import numpy as np
import pytest

import gpu_fft_tpu as gf


def test_rfft_matches_numpy(rng):
    x = rng.uniform(-1.0, 1.0, 1024).astype(np.float32)
    re, im = gf.rfft(x)
    ref = np.fft.rfft(x.astype(np.float64))
    assert re.shape == (513,)
    scale = np.abs(ref).max()
    assert np.abs(re - ref.real).max() / scale < 1e-5
    assert np.abs(im - ref.imag).max() / scale < 1e-5


def test_rfft_pads_like_fft(rng):
    x = rng.uniform(-1.0, 1.0, 1000).astype(np.float32)
    re, im = gf.rfft(x)  # pads to 1024
    assert re.shape == (513,)


def test_irfft_roundtrip(rng):
    x = rng.uniform(-1.0, 1.0, 512).astype(np.float32)
    out = gf.irfft(*gf.rfft(x))
    eps = 5.0 * np.log2(512) * float(np.finfo(np.float32).eps)
    assert out.shape == (512,)
    assert np.abs(out - x).max() <= eps


def test_irfft_rejects_bad_bins():
    with pytest.raises(ValueError):
        gf.irfft(np.zeros(6, np.float32), np.zeros(6, np.float32))  # n=10 not pow2
    with pytest.raises(ValueError):
        gf.irfft(np.zeros(5, np.float32), np.zeros(4, np.float32))


@pytest.mark.parametrize("mode", ["full", "same", "valid"])
def test_fft_convolve_matches_numpy(rng, mode):
    for la, lb in ((100, 7), (33, 33), (257, 16)):
        a = rng.uniform(-1.0, 1.0, la).astype(np.float32)
        b = rng.uniform(-1.0, 1.0, lb).astype(np.float32)
        got = gf.fft_convolve(a, b, mode=mode)
        ref = np.convolve(a.astype(np.float64), b.astype(np.float64), mode=mode)
        assert got.shape == ref.shape, (la, lb, mode)
        scale = max(1.0, float(np.abs(ref).max()))
        assert np.abs(got - ref).max() / scale < 1e-5, (la, lb, mode)


def test_fft_convolve_kernel_longer_than_signal(rng):
    # 'same' must return max(la, lb) samples (numpy semantics), also when
    # the kernel is longer than the signal.
    a = rng.uniform(-1.0, 1.0, 5).astype(np.float32)
    b = rng.uniform(-1.0, 1.0, 9).astype(np.float32)
    for mode in ("full", "same"):
        got = gf.fft_convolve(a, b, mode=mode)
        ref = np.convolve(a.astype(np.float64), b.astype(np.float64), mode=mode)
        assert got.shape == ref.shape, mode
        assert np.abs(got - ref).max() < 1e-4, mode


def test_fft_convolve_length_one():
    assert gf.fft_convolve([2.0], [3.0]).round(5).tolist() == [6.0]
    assert gf.fft_convolve([2.0], [3.0, 1.0]).round(5).tolist() == [6.0, 2.0]


def test_fft_convolve_errors():
    with pytest.raises(ValueError):
        gf.fft_convolve([1.0], [])
    with pytest.raises(ValueError):
        gf.fft_convolve([1.0, 2.0], [1.0, 2.0, 3.0], mode="valid")
    with pytest.raises(ValueError):
        gf.fft_convolve([1.0], [1.0], mode="circular")


def test_shifts_roundtrip(rng):
    import jax.numpy as jnp

    x = rng.uniform(-1.0, 1.0, 17).astype(np.float32)
    assert np.array_equal(gf.fftshift(x), np.fft.fftshift(x))
    assert np.array_equal(gf.ifftshift(gf.fftshift(x)), x)
    xd = jnp.asarray(x)  # device path
    assert np.array_equal(np.asarray(gf.fftshift(xd)), np.fft.fftshift(x))


def test_rfft_irfft_device_roundtrip(rng):
    import jax.numpy as jnp

    x = rng.uniform(-1.0, 1.0, (3, 256)).astype(np.float32)
    yr, yi = gf.rfft_device(jnp.asarray(x))
    assert yr.shape == (3, 129)
    out = gf.irfft_device(yr, yi)
    eps = 5.0 * np.log2(256) * float(np.finfo(np.float32).eps)
    assert out.shape == (3, 256)
    assert np.abs(np.asarray(out) - x).max() <= eps
    with pytest.raises(ValueError):
        gf.irfft_device(np.zeros(6, np.float32), np.zeros(6, np.float32))


def test_fft_convolve_device_batched(rng):
    import jax.numpy as jnp

    a = rng.uniform(-1.0, 1.0, (4, 100)).astype(np.float32)
    b = rng.uniform(-1.0, 1.0, (4, 7)).astype(np.float32)
    out = np.asarray(gf.fft_convolve_device(jnp.asarray(a), jnp.asarray(b)))
    assert out.shape == (4, 106)
    for i in range(4):
        ref = np.convolve(a[i].astype(np.float64), b[i].astype(np.float64))
        assert np.abs(out[i] - ref).max() / max(1.0, np.abs(ref).max()) < 1e-5
    with pytest.raises(ValueError):
        gf.fft_convolve_device(np.zeros((2, 4), np.float32), np.zeros((3, 4), np.float32))


def test_fft_convolve_device_shape_contract(rng):
    # 1-D x 1-D -> 1-D (matches the host API); 1-D kernel broadcasts over a
    # batched signal.
    out = np.asarray(gf.fft_convolve_device([1.0, 2.0, 3.0], [1.0, 1.0]))
    assert out.shape == (4,)
    assert np.allclose(out, [1.0, 3.0, 5.0, 3.0], atol=1e-5)
    a = rng.uniform(-1.0, 1.0, (3, 50)).astype(np.float32)
    k = rng.uniform(-1.0, 1.0, 5).astype(np.float32)
    out = np.asarray(gf.fft_convolve_device(a, k))
    assert out.shape == (3, 54)
    for i in range(3):
        ref = np.convolve(a[i].astype(np.float64), k.astype(np.float64))
        assert np.abs(out[i] - ref).max() < 1e-4


# ── DCT/DST types 1 and 4 ────────────────────────────────────────────────────


@pytest.mark.parametrize("n", [2, 3, 17, 100, 256])
@pytest.mark.parametrize("type_", [1, 4])
@pytest.mark.parametrize("norm", [None, "ortho"])
def test_dct_dst_types_1_4_match_scipy(rng, n, type_, norm):
    import scipy.fft

    x = rng.standard_normal((2, n)).astype(np.float32)
    got = np.asarray(gf.dct_device(x, type=type_, norm=norm))
    ref = scipy.fft.dct(x.astype(np.float64), type=type_, norm=norm, axis=-1)
    scale = max(1.0, np.abs(ref).max())
    assert np.abs(got - ref).max() / scale < 5e-5, "dct"
    gots = np.asarray(gf.dst_device(x, type=type_, norm=norm))
    refs = scipy.fft.dst(x.astype(np.float64), type=type_, norm=norm, axis=-1)
    scale = max(1.0, np.abs(refs).max())
    assert np.abs(gots - refs).max() / scale < 5e-5, "dst"


@pytest.mark.parametrize("type_", [1, 4])
@pytest.mark.parametrize("norm", [None, "ortho"])
def test_dct_dst_types_1_4_roundtrip(rng, type_, norm):
    x = rng.standard_normal(129).astype(np.float32)
    assert np.abs(gf.idct(gf.dct(x, type=type_, norm=norm), type=type_, norm=norm) - x).max() < 1e-4
    assert np.abs(gf.idst(gf.dst(x, type=type_, norm=norm), type=type_, norm=norm) - x).max() < 1e-4


def test_dct_type_bounds():
    with pytest.raises(ValueError):
        gf.dct([1.0, 2.0], type=5)
    with pytest.raises(ValueError):
        gf.dct([1.0], type=1)  # DCT-I needs n >= 2


# ── dctn / idctn ─────────────────────────────────────────────────────────────


@pytest.mark.parametrize("shape,axes", [((8, 8), None), ((16, 24), None), ((4, 8, 12), (1, 2))])
@pytest.mark.parametrize("type_", [1, 2, 4])
def test_dctn_matches_scipy(rng, shape, axes, type_):
    import scipy.fft

    x = rng.standard_normal(shape).astype(np.float32)
    got = gf.dctn(x, type=type_, norm="ortho", axes=axes)
    ref = scipy.fft.dctn(x.astype(np.float64), type=type_, norm="ortho", axes=axes)
    scale = max(1.0, np.abs(ref).max())
    assert np.abs(got - ref).max() / scale < 5e-5


def test_dctn_jpeg_style_roundtrip(rng):
    # The JPEG transform: 2-D type-II 'ortho' over 8x8 blocks.
    blocks = rng.standard_normal((64, 8, 8)).astype(np.float32)
    coeffs = np.asarray(gf.dctn_device(blocks, norm="ortho", axes=(1, 2)))
    back = np.asarray(gf.idctn_device(coeffs, norm="ortho", axes=(1, 2)))
    assert np.abs(back - blocks).max() < 1e-5
    # Energy preservation (orthonormal).
    assert abs((coeffs**2).sum() - (blocks**2).sum()) / (blocks**2).sum() < 1e-5


def test_dctn_contract_errors(rng):
    with pytest.raises(ValueError):
        gf.dctn(np.ones((4, 4), np.float32), axes=(0, 0))
    with pytest.raises(ValueError):
        gf.dctn(np.ones((4, 4), np.float32), axes=(5,))
    with pytest.raises(ValueError):
        gf.dctn(np.ones((4, 4), np.float32), type=7)


@pytest.mark.parametrize("type_", [1, 2, 4])
def test_dstn_matches_scipy(rng, type_):
    import scipy.fft

    x = rng.standard_normal((12, 20)).astype(np.float32)
    got = gf.dstn(x, type=type_, norm="ortho")
    ref = scipy.fft.dstn(x.astype(np.float64), type=type_, norm="ortho")
    scale = max(1.0, np.abs(ref).max())
    assert np.abs(got - ref).max() / scale < 5e-5
    back = gf.idstn(got, type=type_, norm="ortho")
    assert np.abs(back - x).max() < 1e-4
