"""Model family: FNO modules, training steps, data-parallel parity.

Oracle strategy mirrors the suite's pattern: the spectral-conv math is
re-derived independently in numpy (numpy.fft rfft2 + einsum over the same
parameters flax initialized) and the module must match to transform
precision.  Training tests assert the optimization actually works (loss
falls by an order of magnitude on a learnable synthetic operator), and the
sharded step must equal the single-chip step on identical data.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from gpu_fft_tpu.models import (
    FNO1d,
    FNO2d,
    SpectralConv1d,
    SpectralConv2d,
    append_grid,
    fit,
    make_data_parallel_step,
    make_train_step,
    mse,
)


@pytest.fixture(scope="module")
def mesh8():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    from jax.sharding import Mesh

    return Mesh(np.asarray(devs[:8]), ("dp",))


def _np_spectral_conv2d(x, params, m1, m2):
    """Independent numpy oracle for SpectralConv2d (channels-last)."""
    w1 = params["w1_real"] + 1j * params["w1_imag"]
    w2 = params["w2_real"] + 1j * params["w2_imag"]
    xc = np.transpose(np.asarray(x, np.float64), (0, 3, 1, 2))
    spec = np.fft.rfft2(xc)
    b, c, h, hw = spec.shape
    o = w1.shape[1]
    out = np.zeros((b, o, h, hw), complex)
    out[:, :, :m1, :m2] = np.einsum("bcxy,coxy->boxy", spec[:, :, :m1, :m2], w1)
    out[:, :, h - m1 :, :m2] = np.einsum(
        "bcxy,coxy->boxy", spec[:, :, h - m1 :, :m2], w2
    )
    y = np.fft.irfft2(out)
    return np.transpose(y, (0, 2, 3, 1))


def test_spectral_conv2d_matches_numpy_oracle(rng):
    x = rng.standard_normal((2, 16, 32, 3)).astype(np.float32)
    mod = SpectralConv2d(out_channels=4, modes1=5, modes2=7)
    params = mod.init(jax.random.PRNGKey(0), x)
    got = np.asarray(mod.apply(params, x))
    want = _np_spectral_conv2d(x, jax.tree.map(np.asarray, params["params"]), 5, 7)
    assert got.shape == (2, 16, 32, 4)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_spectral_conv1d_matches_numpy_oracle(rng):
    x = rng.standard_normal((3, 64, 2)).astype(np.float32)
    mod = SpectralConv1d(out_channels=5, modes=9)
    params = mod.init(jax.random.PRNGKey(1), x)
    got = np.asarray(mod.apply(params, x))
    p = jax.tree.map(np.asarray, params["params"])
    w = p["w_real"] + 1j * p["w_imag"]
    spec = np.fft.rfft(np.transpose(np.asarray(x, np.float64), (0, 2, 1)))
    out = np.zeros((3, 5, 33), complex)
    out[:, :, :9] = np.einsum("bcx,cox->box", spec[:, :, :9], w)
    want = np.transpose(np.fft.irfft(out), (0, 2, 1))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_spectral_conv_mode_validation(rng):
    x = jnp.zeros((1, 16, 16, 1))
    with pytest.raises(ValueError, match="modes1"):
        SpectralConv2d(1, modes1=9, modes2=2).init(jax.random.PRNGKey(0), x)
    with pytest.raises(ValueError, match="modes2"):
        SpectralConv2d(1, modes1=2, modes2=10).init(jax.random.PRNGKey(0), x)
    with pytest.raises(ValueError, match="modes"):
        SpectralConv1d(1, modes=40).init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 1)))


def test_append_grid_shapes_and_values():
    x = jnp.zeros((2, 8, 4, 1))
    g = append_grid(x)
    assert g.shape == (2, 8, 4, 3)
    np.testing.assert_allclose(np.asarray(g[0, :, 0, 1]), np.arange(8) / 8, atol=1e-7)
    np.testing.assert_allclose(np.asarray(g[0, 0, :, 2]), np.arange(4) / 4, atol=1e-7)
    x1 = jnp.zeros((1, 16, 2))
    assert append_grid(x1).shape == (1, 16, 3)


def test_fno2d_forward_jit_and_grads(rng):
    x = rng.standard_normal((2, 16, 16, 1)).astype(np.float32)
    model = FNO2d(modes1=4, modes2=4, width=8, depth=2)
    params = model.init(jax.random.PRNGKey(0), x)
    y = jax.jit(model.apply)(params, x)
    assert y.shape == (2, 16, 16, 1)
    assert bool(jnp.all(jnp.isfinite(y)))
    g = jax.grad(lambda p: jnp.sum(model.apply(p, x) ** 2))(params)
    leaves = jax.tree.leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves), "gradient vanished"


def _derivative_problem(rng, batch, length):
    """Synthetic operator learning: u -> du/dx on band-limited signals."""
    k = np.arange(1, 5)
    amp = rng.standard_normal((batch, k.size))
    phase = rng.uniform(0, 2 * np.pi, (batch, k.size))
    t = np.arange(length) / length
    u = np.einsum("bk,bkl->bl", amp, np.sin(2 * np.pi * k[None, :, None] * t + phase[..., None]))
    du = np.einsum(
        "bk,bkl->bl",
        amp * 2 * np.pi * k,
        np.cos(2 * np.pi * k[None, :, None] * t + phase[..., None]),
    )
    scale = np.abs(du).max()
    return (
        u[..., None].astype(np.float32),
        (du / scale)[..., None].astype(np.float32),
    )


def test_fno1d_learns_derivative(rng):
    x, y = _derivative_problem(rng, 16, 64)
    model = FNO1d(modes=8, width=16, depth=2)
    params = model.init(jax.random.PRNGKey(0), x)
    opt = optax.adam(3e-3)
    step = make_train_step(model.apply, opt)
    params, _, losses = fit(step, params, opt.init(params), [(x, y)], steps=60)
    assert losses[-1] < losses[0] / 10, f"no learning: {losses[0]} -> {losses[-1]}"


def test_data_parallel_step_matches_single_chip(rng, mesh8):
    x, y = _derivative_problem(rng, 8, 64)
    model = FNO1d(modes=4, width=8, depth=1)
    params = model.init(jax.random.PRNGKey(2), x)
    opt = optax.adam(1e-3)
    ref_step = make_train_step(model.apply, opt)
    dp_step = make_data_parallel_step(model.apply, opt, mesh8, axis=mesh8.axis_names[0])
    p_ref, _, l_ref = ref_step(params, opt.init(params), x, y)
    p_dp, _, l_dp = dp_step(params, opt.init(params), x, y)
    assert abs(float(l_ref) - float(l_dp)) < 1e-6
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_dp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_gspmd_2d_parallel_step_matches_single_chip(rng):
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    from jax.sharding import Mesh

    from gpu_fft_tpu.models import make_gspmd_step, param_shardings

    mesh = Mesh(np.asarray(devs[:8]).reshape(2, 4), ("dp", "tp"))
    x, y = _derivative_problem(rng, 8, 64)
    model = FNO1d(modes=8, width=16, depth=2)
    params = model.init(jax.random.PRNGKey(3), x)
    opt = optax.adam(1e-3)
    p_ref, _, l_ref = make_train_step(model.apply, opt)(params, opt.init(params), x, y)
    step, shard = make_gspmd_step(model.apply, opt, mesh, dp_axis="dp", tp_axis="tp")
    ps, os_ = shard(params, opt.init(params))
    p_tp, _, l_tp = step(ps, os_, x, y)
    jax.block_until_ready(p_tp)
    assert abs(float(l_ref) - float(l_tp)) < 1e-6
    err = max(
        float(jnp.abs(a - b).max())
        for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_tp))
    )
    assert err < 5e-6, f"gspmd update diverged: {err}"
    # The layout hint must actually have sharded something over tp.
    specs = {str(l.sharding.spec) for l in jax.tree.leaves(p_tp)}
    assert any("tp" in s for s in specs), f"nothing sharded: {specs}"


def test_param_shardings_rule(rng):
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    from jax.sharding import Mesh

    from gpu_fft_tpu.models import param_shardings

    mesh = Mesh(np.asarray(devs[:8]), ("tp",))
    tree = {
        "dense": jnp.zeros((3, 16)),  # 16 % 8 == 0 -> last dim sharded
        "odd": jnp.zeros((3, 7)),  # not divisible -> replicated
        "tiny": jnp.zeros((4,)),  # smaller than axis -> replicated
    }
    sh = param_shardings(tree, mesh, "tp")
    assert "tp" in str(sh["dense"].spec)
    assert "tp" not in str(sh["odd"].spec)
    assert "tp" not in str(sh["tiny"].spec)


def test_mse_value():
    assert float(mse(jnp.ones((2, 2)), jnp.zeros((2, 2)))) == 1.0
