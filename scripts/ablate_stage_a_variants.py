"""Stage-A engine/twiddle-placement ablation (round 3; docs/ABLATION.md §12).

Variants at B=1 (chained timing, 5 reps, interleaved):
  * kernel+tw    — the shipped path: Pallas column-DFT kernel, twiddle in-kernel
  * kernel+defer — Pallas kernel without twiddle; twiddle reconstructed from its
                   factors inside stage B's first XLA fusion
  * dots+defer   — stage A as bare 2-D jnp left dots (F1 @ X), twiddle deferred
  * dots+twnow   — bare 2-D dots + immediate jnp twiddle

Measured v5e 2026-08: kernel+tw ~= kernel+defer (91.6 vs 94.6 us at 2^20);
both dot forms lose 1.5x IN COMPOSITION (135 us) even though the bare dot in
isolation runs 2x faster than the kernel (9.4 us/dot) — XLA's layout choices
for a dot feeding the stage-B einsum chain cost more than the Pallas kernel's
overhead.  The library keeps kernel+tw.

The losing variants are reconstructed locally below so this harness stays
runnable against the shipped library.
"""

def _local_variants():
    import jax.numpy as jnp
    from gpu_fft_tpu import config
    from gpu_fft_tpu.config import KARATSUBA

    def _dot(a, b):
        return jnp.dot(a, b, precision=config.matmul_precision(),
                       preferred_element_type=jnp.float32)

    def stage_a_dots_b1(x2r, x2i, plan):
        if x2i is None:
            return _dot(plan["f1r"], x2r), _dot(plan["f1i"], x2r)
        k1 = _dot(plan["f1r"], x2r + x2i)
        k2 = _dot(plan["f1d"], x2r)
        k3 = _dot(plan["f1s"], x2i)
        return k1 - k3, k1 + k2

    return stage_a_dots_b1

import numpy as np, jax, jax.numpy as jnp
from gpu_fft_tpu.config import enable_compilation_cache
enable_compilation_cache()
from gpu_fft_tpu import plan as P
from gpu_fft_tpu.kernels.fused import stage_a
from gpu_fft_tpu.kernels.fused_jnp import stage_b_jnp
from gpu_fft_tpu.utils.profiling import chained_step_stats
rng = np.random.default_rng(0)

stage_a_dots_b1 = _local_variants()

def run(n):
    plan = P.get_stage_a_plan(n, -1)
    n1, n2 = plan["n1"], plan["n2"]
    ct = plan["ct"]
    sb = plan["stage_b"]
    pre = (plan["two_r"], plan["two_i"], plan["twi_r"], plan["twi_i"])
    x = jnp.asarray(rng.standard_normal((1, n)).astype(np.float32))

    def tw_jnp(yr, yi):
        o_r, o_i, i_r, i_i = pre
        twr = (o_r[:, :, None] * i_r[:, None, :] - o_i[:, :, None] * i_i[:, None, :]).reshape(1, n1, n2)
        twi = (o_r[:, :, None] * i_i[:, None, :] + o_i[:, :, None] * i_r[:, None, :]).reshape(1, n1, n2)
        return yr * twr - yi * twi, yr * twi + yi * twr

    def v_kernel_tw(v):
        yr, yi = stage_a(v.reshape(1, n1, n2), None, n1, n2, plan, ct)
        return stage_b_jnp(yr, yi, n1, n2, sb)
    def v_dots_twnow(v):
        r2, i2 = stage_a_dots_b1(v.reshape(n1, n2), None, plan)
        yr, yi = tw_jnp(r2[None], i2[None])
        return stage_b_jnp(yr, yi, n1, n2, sb)

    for name, fn in (("kernel+tw", v_kernel_tw), ("dots+twnow", v_dots_twnow)):
        def step(v, fn=fn):
            yr, yi = fn(v)
            return yr * jnp.float32(1e-6) + v * jnp.float32(0.9)
        s = chained_step_stats(step, x, k1=20, k2=220, reps=5)
        print(f"n=2^{n.bit_length()-1} {name}: {s.median_s*1e6:.2f} us (iqr {s.iqr_s*1e6:.2f})", flush=True)

run(1 << 17)
run(1 << 20)
