"""scipy.ndimage fourier_* parity (ops/ndimage_fourier.py).

Oracle: scipy.ndimage itself, driven over complex-fft and real-rfft input
modes, scalar and per-axis parameters, 1/2/3-D, odd and even sizes.  The
filters are pure spectral multipliers, so parity is element-wise to f32
rounding of an f64 table.
"""

import numpy as np
import pytest
import scipy.ndimage as sndi

import gpu_fft_tpu.ndimage as gndi


def _spec(shape, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    return x.astype(np.complex128)


TOL = 2e-6


@pytest.mark.parametrize("shape", [(16,), (16, 12), (8, 6, 10), (15,), (9, 7)])
@pytest.mark.parametrize("param", [2.0, 0.5])
def test_fourier_gaussian_complex(shape, param):
    x = _spec(shape)
    ref = sndi.fourier_gaussian(x, param)
    out = np.asarray(gndi.fourier_gaussian(x, param))
    assert np.abs(out - ref).max() < TOL * max(1.0, np.abs(ref).max())


def test_fourier_gaussian_per_axis_sigma():
    x = _spec((12, 16))
    ref = sndi.fourier_gaussian(x, (1.5, 3.0))
    out = np.asarray(gndi.fourier_gaussian(x, (1.5, 3.0)))
    assert np.abs(out - ref).max() < TOL * np.abs(ref).max()


@pytest.mark.parametrize("shape", [(16,), (16, 12), (8, 6, 10)])
@pytest.mark.parametrize("size", [5.0, 2.0])
def test_fourier_uniform_complex(shape, size):
    x = _spec(shape)
    ref = sndi.fourier_uniform(x, size)
    out = np.asarray(gndi.fourier_uniform(x, size))
    assert np.abs(out - ref).max() < TOL * max(1.0, np.abs(ref).max())


@pytest.mark.parametrize("shape,size", [
    ((32,), 7.0),                # 1-D: sinc
    ((16, 12), 5.0),             # 2-D: 2*J1(r)/r (self-contained J1)
    ((16, 12), (4.0, 6.0)),
    ((8, 6, 10), 3.0),           # 3-D: closed form
    ((64, 64), 25.0),            # large argument exercises the J1 integral
])
def test_fourier_ellipsoid(shape, size):
    x = _spec(shape)
    ref = sndi.fourier_ellipsoid(x, size)
    out = np.asarray(gndi.fourier_ellipsoid(x, size))
    assert np.abs(out - ref).max() < TOL * max(1.0, np.abs(ref).max())


def test_fourier_ellipsoid_4d_raises():
    with pytest.raises(NotImplementedError):
        gndi.fourier_ellipsoid(_spec((4, 4, 4, 4)), 2.0)


@pytest.mark.parametrize("shape,shift", [
    ((16,), 3.0),
    ((16,), -2.5),
    ((16, 12), (1.0, -4.5)),
    ((8, 6, 10), 2.0),
])
def test_fourier_shift_complex(shape, shift):
    x = _spec(shape)
    ref = sndi.fourier_shift(x, shift)
    out = np.asarray(gndi.fourier_shift(x, shift))
    assert np.abs(out - ref).max() < TOL * max(1.0, np.abs(ref).max())


@pytest.mark.parametrize("fn,gfn,param", [
    (sndi.fourier_gaussian, gndi.fourier_gaussian, 1.5),
    (sndi.fourier_uniform, gndi.fourier_uniform, 4.0),
    (sndi.fourier_ellipsoid, gndi.fourier_ellipsoid, 4.0),
    (sndi.fourier_shift, gndi.fourier_shift, 2.5),
])
def test_real_transform_mode(fn, gfn, param):
    # n >= 0: the axis holds an rfft of a length-n real signal.
    rng = np.random.default_rng(1)
    n = 24
    sig = rng.standard_normal((10, n))
    spec = np.fft.rfft(sig, axis=-1)
    ref = fn(spec, param, n=n, axis=-1)
    out = np.asarray(gfn(spec, param, n=n, axis=-1))
    assert np.abs(out - ref).max() < TOL * max(1.0, np.abs(ref).max())


def test_end_to_end_gaussian_blur_matches_scipy_pipeline():
    # fft2 -> fourier_gaussian -> ifft2 equals scipy's same pipeline.
    rng = np.random.default_rng(2)
    img = rng.standard_normal((24, 20))
    ref = np.fft.ifft2(sndi.fourier_gaussian(np.fft.fft2(img), sigma=2.0)).real

    import gpu_fft_tpu.compat as cf

    out = np.asarray(cf.ifft2(gndi.fourier_gaussian(cf.fft2(img), sigma=2.0)).real)
    assert np.abs(out - ref).max() < 5e-5


def test_device_split_variants_match_facade():
    import jax.numpy as jnp

    x = _spec((12, 16))
    xr = jnp.asarray(x.real, jnp.float32)
    xi = jnp.asarray(x.imag, jnp.float32)
    yr, yi = gndi.fourier_shift_device(xr, xi, (1.0, -2.0))
    ref = np.asarray(gndi.fourier_shift(x, (1.0, -2.0)))
    assert np.abs((np.asarray(yr) + 1j * np.asarray(yi)) - ref).max() < TOL * np.abs(ref).max()
    # real-spectrum None imag path
    yr2, yi2 = gndi.fourier_gaussian_device(xr, None, 2.0)
    assert yi2 is None
    ref2 = np.asarray(gndi.fourier_gaussian(x.real.copy(), 2.0))
    assert np.abs(np.asarray(yr2) - ref2).max() < TOL


def test_output_param_rejected():
    with pytest.raises(ValueError):
        gndi.fourier_gaussian(_spec((8,)), 1.0, output=np.zeros(8, complex))


def test_jit_composable():
    import jax
    import jax.numpy as jnp

    x = _spec((16, 12))
    xr = jnp.asarray(x.real, jnp.float32)
    xi = jnp.asarray(x.imag, jnp.float32)

    @jax.jit
    def step(a, b):
        return gndi.fourier_gaussian_device(a, b, 2.0)

    yr, yi = step(xr, xi)
    ref = sndi.fourier_gaussian(x, 2.0)
    assert np.abs((np.asarray(yr) + 1j * np.asarray(yi)) - ref).max() < TOL * np.abs(ref).max()
