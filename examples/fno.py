"""Operator learning with the built-in FNO model family.

Trains a 1-D Fourier Neural Operator to learn the antiderivative operator
u -> ∫u (a classic FNO benchmark problem: a nonlocal operator that a local
conv cannot represent but a spectral mix learns in a few dozen steps), then
runs a 2-D FNO forward pass to show the image-sized path. Every transform
inside the model rides the library's measured device dispatch, and the
backward pass is the linear-call transpose seam — one inverse-family
transform per spectral layer.

Run: python examples/fno.py
"""

import sys

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import optax  # noqa: E402

from gpu_fft_tpu.models import FNO1d, FNO2d, fit, make_train_step  # noqa: E402


def antiderivative_batch(rng, batch, length):
    """Band-limited u and its zero-mean antiderivative, both (B, L, 1)."""
    k = np.arange(1, 6)
    t = np.arange(length) / length
    amp = rng.standard_normal((batch, k.size))
    phase = rng.uniform(0, 2 * np.pi, (batch, k.size))
    arg = 2 * np.pi * k[None, :, None] * t + phase[..., None]
    u = np.einsum("bk,bkl->bl", amp, np.cos(arg))
    anti = np.einsum("bk,bkl->bl", amp / (2 * np.pi * k), np.sin(arg))
    return u[..., None].astype(np.float32), anti[..., None].astype(np.float32)


def main() -> int:
    rng = np.random.default_rng(0)
    x_train, y_train = antiderivative_batch(rng, 32, 128)
    x_test, y_test = antiderivative_batch(rng, 8, 128)

    model = FNO1d(modes=8, width=24, depth=3)
    params = model.init(jax.random.PRNGKey(0), x_train)
    n_params = sum(p.size for p in jax.tree.leaves(params))
    print(f"FNO1d: {n_params} parameters, modes=8 width=24 depth=3")

    opt = optax.adam(3e-3)
    step = make_train_step(model.apply, opt)
    params, _, losses = fit(step, params, opt.init(params), [(x_train, y_train)], 80)
    print(f"train mse: step 0 = {losses[0]:.5f}, step 79 = {losses[-1]:.6f}")

    pred = model.apply(params, x_test)
    test_mse = float(np.mean((np.asarray(pred) - y_test) ** 2))
    rel = test_mse / float(np.mean(y_test**2))
    print(f"held-out mse = {test_mse:.6f} (relative {rel:.4f})")
    status = "[OK]" if losses[-1] < losses[0] / 10 and rel < 0.1 else "[FAIL]"
    print(f"{status} antiderivative operator learned")

    # 2-D path: one forward through an image-sized FNO.
    model2 = FNO2d(modes1=6, modes2=6, width=12, depth=2)
    x2 = rng.standard_normal((2, 64, 64, 1)).astype(np.float32)
    params2 = model2.init(jax.random.PRNGKey(1), x2)
    y2 = jax.jit(model2.apply)(params2, x2)
    print(f"FNO2d forward: {x2.shape} -> {tuple(y2.shape)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
