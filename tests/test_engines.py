"""Engine cross-validation: jnp, pallas, and auto must agree.

config.ENGINE selects the kernel engine (jnp-level fused transforms by
default, Pallas kernels on request); every engine must produce the same
spectra within f32 tolerance.
"""

import numpy as np
import pytest
from conftest import assert_slice_approx

from gpu_fft_tpu import config
from gpu_fft_tpu.kernels.large import transform_any


@pytest.mark.parametrize("n", [256, 4096, 65536, 1 << 17])
def test_engines_agree(rng, monkeypatch, n):
    import jax.numpy as jnp

    x = jnp.asarray(rng.uniform(-1.0, 1.0, (2, n)).astype(np.float32))
    results = {}
    for engine in ("auto", "jnp", "pallas"):
        monkeypatch.setattr(config, "ENGINE", engine)
        yr, yi = transform_any(x, None, n, -1)
        results[engine] = (np.asarray(yr), np.asarray(yi))
    tol = 1e-3 * max(1.0, np.sqrt(n) / 4.0)
    for engine in ("jnp", "pallas"):
        assert_slice_approx(
            results[engine][0], results["auto"][0], eps=tol, label=f"{engine} real n={n}"
        )
        assert_slice_approx(
            results[engine][1], results["auto"][1], eps=tol, label=f"{engine} imag n={n}"
        )


def test_engine_inverse_agree(rng, monkeypatch):
    import jax.numpy as jnp

    n = 4096
    xr = jnp.asarray(rng.uniform(-1.0, 1.0, (2, n)).astype(np.float32))
    xi = jnp.asarray(rng.uniform(-1.0, 1.0, (2, n)).astype(np.float32))
    outs = {}
    for engine in ("auto", "pallas"):
        monkeypatch.setattr(config, "ENGINE", engine)
        yr, yi = transform_any(xr, xi, n, +1)
        outs[engine] = np.asarray(yr)
    assert_slice_approx(outs["pallas"], outs["auto"], eps=1e-2, label="inverse engines")
