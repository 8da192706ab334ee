"""scipy.fft drop-in namespace (gpu_fft_tpu.compat) — oracle: scipy.fft.

Every function is compared element-wise against scipy on non-trivial
shapes: non-pow2 lengths, crop/pad ``n``/``s``, non-default axes, and all
three norm conventions.
"""

import numpy as np
import pytest
import scipy.fft as sf

import gpu_fft_tpu.compat as cf

NORMS = [None, "ortho", "forward"]


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    return {
        "x": rng.standard_normal((3, 50)).astype(np.float32),
        "z": (rng.standard_normal((3, 50)) + 1j * rng.standard_normal((3, 50))).astype(
            np.complex64
        ),
        "w": rng.standard_normal((4, 12, 20)).astype(np.float32),
        "zc": (
            rng.standard_normal((4, 12, 20)) + 1j * rng.standard_normal((4, 12, 20))
        ).astype(np.complex64),
    }


def assert_close(got, ref, tol=3e-5, label=""):
    got = np.asarray(got)
    assert got.shape == ref.shape, f"{label}: {got.shape} vs {ref.shape}"
    scale = max(1.0, float(np.abs(ref).max()))
    assert np.abs(got - ref).max() / scale < tol, label


@pytest.mark.parametrize("norm", NORMS)
def test_fft_ifft(data, norm):
    z = data["z"]
    assert_close(cf.fft(z, norm=norm), sf.fft(z.astype(np.complex128), norm=norm))
    assert_close(cf.ifft(z, norm=norm), sf.ifft(z.astype(np.complex128), norm=norm))


@pytest.mark.parametrize("norm", NORMS)
def test_real_hermitian_1d(data, norm):
    x, z = data["x"], data["z"]
    assert_close(cf.rfft(x, norm=norm), sf.rfft(x.astype(np.float64), norm=norm))
    h = z[:, :26]
    assert_close(cf.irfft(h, norm=norm), sf.irfft(h.astype(np.complex128), norm=norm))
    assert_close(cf.hfft(h, norm=norm), sf.hfft(h.astype(np.complex128), norm=norm))
    assert_close(cf.ihfft(x, norm=norm), sf.ihfft(x.astype(np.float64), norm=norm))


def test_n_crop_pad_and_axis(data):
    z, x = data["z"], data["x"]
    assert_close(cf.fft(z, n=30), sf.fft(z.astype(np.complex128), n=30))
    assert_close(cf.fft(z, n=64, axis=0), sf.fft(z.astype(np.complex128), n=64, axis=0))
    assert_close(cf.rfft(x, n=64), sf.rfft(x.astype(np.float64), n=64))  # pow2 fast path
    h = z[:, :26]
    assert_close(cf.irfft(h, n=64), sf.irfft(h.astype(np.complex128), n=64))
    assert_close(cf.irfft(h, n=51), sf.irfft(h.astype(np.complex128), n=51))  # odd out
    assert_close(cf.irfft(h, n=20), sf.irfft(h.astype(np.complex128), n=20))  # crop bins


@pytest.mark.parametrize("norm", NORMS)
def test_nd_complex(data, norm):
    zc = data["zc"]
    ref = zc.astype(np.complex128)
    assert_close(cf.fftn(zc, norm=norm), sf.fftn(ref, norm=norm))
    assert_close(cf.ifftn(zc, norm=norm), sf.ifftn(ref, norm=norm))
    assert_close(cf.fft2(zc, norm=norm), sf.fft2(ref, norm=norm))
    assert_close(cf.ifft2(zc, norm=norm), sf.ifft2(ref, norm=norm))


@pytest.mark.parametrize("norm", NORMS)
def test_nd_real_hermitian(data, norm):
    w, zc = data["w"], data["zc"]
    half = zc[..., :11]
    assert_close(cf.rfftn(w, norm=norm), sf.rfftn(w.astype(np.float64), norm=norm))
    assert_close(
        cf.irfftn(half, norm=norm), sf.irfftn(half.astype(np.complex128), norm=norm)
    )
    assert_close(
        cf.hfftn(half, norm=norm), sf.hfftn(half.astype(np.complex128), norm=norm)
    )
    assert_close(cf.ihfftn(w, norm=norm), sf.ihfftn(w.astype(np.float64), norm=norm))
    assert_close(
        cf.hfft2(half, norm=norm), sf.hfft2(half.astype(np.complex128), norm=norm)
    )
    assert_close(cf.ihfft2(w, norm=norm), sf.ihfft2(w.astype(np.float64), norm=norm))


def test_s_axes_resolution(data):
    zc, w = data["zc"], data["w"]
    ref = zc.astype(np.complex128)
    assert_close(cf.fftn(zc, s=(8, 16)), sf.fftn(ref, s=(8, 16)))
    assert_close(cf.fftn(zc, axes=(0, 2)), sf.fftn(ref, axes=(0, 2)))
    assert_close(
        cf.rfftn(w, s=(8, 32), axes=(1, 2)),
        sf.rfftn(w.astype(np.float64), s=(8, 32), axes=(1, 2)),
    )
    assert_close(
        cf.hfftn(zc[..., :11], s=(8, 16), axes=(1, 2)),
        sf.hfftn(zc[..., :11].astype(np.complex128), s=(8, 16), axes=(1, 2)),
    )


@pytest.mark.parametrize("type", [1, 2, 3, 4])
@pytest.mark.parametrize("norm", [None, "ortho"])
def test_dct_dst(data, type, norm):
    x = data["x"]
    ref = x.astype(np.float64)
    assert_close(cf.dct(x, type=type, norm=norm), sf.dct(ref, type=type, norm=norm))
    assert_close(cf.idct(x, type=type, norm=norm), sf.idct(ref, type=type, norm=norm))
    assert_close(cf.dst(x, type=type, norm=norm), sf.dst(ref, type=type, norm=norm))
    assert_close(cf.idst(x, type=type, norm=norm), sf.idst(ref, type=type, norm=norm))


def test_dct_n_axis_and_nd(data):
    x, w = data["x"], data["w"]
    assert_close(cf.dct(x, n=30, axis=0), sf.dct(x.astype(np.float64), n=30, axis=0))
    assert_close(cf.dctn(w, axes=(0, 2)), sf.dctn(w.astype(np.float64), axes=(0, 2)))
    assert_close(
        cf.idstn(w, s=(8, 16), axes=(1, 2)),
        sf.idstn(w.astype(np.float64), s=(8, 16), axes=(1, 2)),
    )


def test_scipy_set_backend_dispatch(data):
    x, z = data["x"], data["z"]
    with sf.set_backend(cf.backend):
        got_fft = sf.fft(z)
        got_dct = sf.dct(x)
        got_rfftn = sf.rfftn(data["w"])
    # inside the context the results come from our path (jnp arrays)
    import jax

    assert isinstance(got_fft, jax.Array)
    assert_close(got_fft, sf.fft(z.astype(np.complex128)))
    assert_close(got_dct, sf.dct(x.astype(np.float64)))
    assert_close(got_rfftn, sf.rfftn(data["w"].astype(np.float64)))


def test_helpers_reexported():
    assert np.allclose(cf.fftfreq(10, 0.1), sf.fftfreq(10, 0.1))
    assert np.allclose(cf.rfftfreq(10, 0.1), sf.rfftfreq(10, 0.1))
    assert cf.next_fast_len(1000) == 1024  # this library's pow2 rule
    x = np.arange(8.0)
    assert np.allclose(cf.fftshift(x), sf.fftshift(x))
    assert np.allclose(cf.ifftshift(x), sf.ifftshift(x))
    # fht family is the scipy-signature implementation re-exported
    assert abs(cf.fhtoffset(0.02, 0.5) - sf.fhtoffset(0.02, 0.5)) < 1e-12


def test_validation():
    z = np.ones(8, np.complex64)
    with pytest.raises(ValueError, match="invalid norm"):
        cf.fft(z, norm="bogus")
    with pytest.raises(ValueError, match="out of bounds"):
        cf.fft(z, axis=3)
    with pytest.raises(ValueError, match="invalid number of data points"):
        cf.fft(z, n=0)
    with pytest.raises(TypeError, match="real input"):
        cf.rfft(z)
    with pytest.raises(ValueError, match="same length"):
        cf.fftn(np.ones((4, 4), np.float32), s=(4, 4), axes=(0,))
    with pytest.raises(ValueError, match="unique"):
        cf.fftn(np.ones((4, 4), np.float32), axes=(1, 1))


def test_jit_composable():
    import jax
    import jax.numpy as jnp

    x = np.random.default_rng(3).standard_normal((2, 48)).astype(np.float32)

    @jax.jit
    def pipeline(v):
        spec = cf.rfft(v)
        return cf.irfft(spec * jnp.conj(spec), n=48)

    out = np.asarray(pipeline(x))
    ref = sf.irfft(np.abs(sf.rfft(x.astype(np.float64))) ** 2, n=48)
    assert np.abs(out - ref).max() / max(1.0, np.abs(ref).max()) < 3e-5


def test_property_fuzz_vs_scipy(rng):
    """Deterministic fuzz: random transform family x shape x axis x n x norm
    against the scipy.fft f64 oracle (the hand-picked cases above pin the
    boundaries; this sweeps the interior)."""
    norms = [None, "ortho", "forward"]
    for _ in range(25):
        family = rng.choice(["fft", "ifft", "rfft", "irfft", "fftn", "rfftn", "dct", "dst"])
        ndim = int(rng.integers(1, 4))
        shape = tuple(int(rng.integers(2, 40)) for _ in range(ndim))
        axis = int(rng.integers(0, ndim))
        norm = norms[int(rng.integers(0, 3))]
        n = int(rng.integers(2, 64)) if rng.random() < 0.5 else None
        xr = rng.standard_normal(shape).astype(np.float32)
        label = f"{family} shape={shape} axis={axis} n={n} norm={norm}"
        if family in ("fft", "ifft"):
            x = (xr + 1j * rng.standard_normal(shape)).astype(np.complex64)
            got = getattr(cf, family)(x, n=n, axis=axis, norm=norm)
            ref = getattr(sf, family)(x.astype(np.complex128), n=n, axis=axis, norm=norm)
        elif family == "rfft":
            got = cf.rfft(xr, n=n, axis=axis, norm=norm)
            ref = sf.rfft(xr.astype(np.float64), n=n, axis=axis, norm=norm)
        elif family == "irfft":
            x = (xr + 1j * rng.standard_normal(shape)).astype(np.complex64)
            if x.shape[axis] < 2 and n is None:
                continue  # scipy rejects n=0 output; covered by validation tests
            got = cf.irfft(x, n=n, axis=axis, norm=norm)
            ref = sf.irfft(x.astype(np.complex128), n=n, axis=axis, norm=norm)
        elif family in ("fftn", "rfftn"):
            x = xr if family == "rfftn" else (xr + 1j * rng.standard_normal(shape)).astype(np.complex64)
            naxes = int(rng.integers(1, ndim + 1))
            axes = tuple(sorted(rng.choice(ndim, size=naxes, replace=False).tolist()))
            s = tuple(int(rng.integers(2, 48)) for _ in axes) if rng.random() < 0.5 else None
            label = f"{family} shape={shape} axes={axes} s={s} norm={norm}"
            got = getattr(cf, family)(x, s=s, axes=axes, norm=norm)
            xref = x.astype(np.complex128 if family == "fftn" else np.float64)
            ref = getattr(sf, family)(xref, s=s, axes=axes, norm=norm)
        else:  # dct / dst
            type_ = int(rng.integers(1, 5))
            norm_r = None if norm == "forward" else norm
            label = f"{family}{type_} shape={shape} axis={axis} n={n} norm={norm_r}"
            got = getattr(cf, family)(xr, type=type_, n=n, axis=axis, norm=norm_r)
            ref = getattr(sf, family)(xr.astype(np.float64), type=type_, n=n, axis=axis, norm=norm_r)
        assert_close(got, ref, tol=5e-5, label=label)


def test_workers_api_roundtrip():
    # scipy.fft worker-pool parity: context-managed value, no-op compute.
    import gpu_fft_tpu.compat as cf

    assert cf.get_workers() == 1
    with cf.set_workers(4):
        assert cf.get_workers() == 4
        with cf.set_workers(2):
            assert cf.get_workers() == 2
        assert cf.get_workers() == 4
    assert cf.get_workers() == 1
    with pytest.raises(ValueError):
        with cf.set_workers(0):
            pass


def test_backend_control_functions():
    # set_backend / skip_backend / register_backend delegate to scipy's
    # uarray registry with this module's backend as the default.
    import scipy.fft as sf

    import gpu_fft_tpu.compat as cf

    x = np.random.default_rng(0).standard_normal(256)
    with cf.set_backend():
        got = sf.fft(x)
    ref = np.fft.fft(x.astype(np.float64))
    assert np.abs(got - ref).max() < 1e-4
    with cf.set_backend():
        with cf.skip_backend():
            assert np.abs(sf.fft(x) - ref).max() < 1e-10  # scipy's own f64 path


def test_register_and_global_backend_subprocess():
    # register_backend / set_global_backend mutate scipy's PROCESS-WIDE
    # uarray registry (scipy offers no undo), which would degrade every
    # later test's scipy oracle to our f32 paths — so they run isolated.
    import subprocess
    import sys

    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import numpy as np, scipy.fft as sf\n"
        "import gpu_fft_tpu.compat as cf\n"
        "cf.register_backend()\n"
        "cf.set_global_backend()\n"
        "x = np.random.default_rng(0).standard_normal(256)\n"
        "got = sf.fft(x)\n"
        "assert got.dtype == np.complex64, got.dtype\n"  # proof it ran our path
        "assert np.abs(got - np.fft.fft(x)).max() < 1e-4\n"
        "print('ok')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=300
    )
    assert out.returncode == 0, out.stderr
    assert "ok" in out.stdout
