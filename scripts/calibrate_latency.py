"""Measure the per-dispatch latency floors on the attached chip.

Two distinct floors matter (round-3 verdict weak item 3):

* **Chained floor** — the minimum per-iteration device time of ANY
  ``x = step(x)`` inside a ``lax.fori_loop`` chain, measured with the same
  paired-difference methodology the bench uses.  This bounds every bench
  row from below: a 2.4 us fft_n1024 row cannot be "1.8% of MXU
  speed-of-light" when no chained step of any kind completes faster than
  ~2 us — the true bound is this floor, and the roofline must carry it
  as a ``t_latency`` term (utils/roofline.py).
* **Unchained dispatch** — wall time of ``jit(f)(x).block_until_ready()``
  per call from the host, the TPU analog of the reference's ~65 us
  wgpu dispatch model (reference README.md:451-455).  Through the axon
  tunnel this includes the transport round-trip, so it is reported
  separately and NOT used in the roofline (the chained methodology
  exists precisely to cancel it).

Run on hardware: ``python scripts/calibrate_latency.py``; paste the
chained floor into ``utils/roofline.py:CHIPS[<chip>].latency_us``.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from gpu_fft_tpu.utils.profiling import chained_step_stats
    from gpu_fft_tpu.utils.roofline import detect_chip

    out: dict = {"device": str(jax.devices()[0]), "chip": detect_chip().name}

    # ── Chained per-step floor: steps of increasing triviality ──────────
    # scale: one VPU multiply on a tiny tile — as close to an empty loop
    #   body as a data-dependent chain allows.
    # add_dot: a single tiny 128x128 matmul — one MXU dispatch.
    # fft1024: the live n=1024 transform, for context.
    rows = {}

    def probe(name, step, x0):
        s = chained_step_stats(step, x0, k1=50, k2=1050, reps=5, retries=1)
        rows[name] = {
            "per_call_us": s.median_s * 1e6,
            "iqr_us": s.iqr_s * 1e6,
            "suspect": s.suspect,
        }
        print(f"[latency] {name}: {s.median_s * 1e6:.3f} us (iqr {s.iqr_s * 1e6:.3f})")

    one = np.float32(1.0 + 2 ** -20)
    probe("scale_8x128", lambda x: x * one, jnp.ones((8, 128), jnp.float32))
    probe("scale_256x1024", lambda x: x * one, jnp.ones((256, 1024), jnp.float32))

    w = jnp.asarray(np.eye(128, dtype=np.float32) * (1.0 + 2 ** -20))
    probe("dot_128x128", lambda x: x @ w, jnp.ones((128, 128), jnp.float32))

    # ── Pallas dispatch floor (round 5): a Mosaic custom call costs far
    # more per launch than an XLA fusion — kernel entry, grid setup, and
    # serialized input-block DMA issue.  Measured as the chained per-call
    # time of a minimal (8,128) copy pallas_call; the delta vs the
    # same-shape fusion (scale_8x128) is the extra the roofline charges
    # per custom call (CHIPS[chip].pallas_call_us).
    from jax.experimental import pallas as pl

    def _copy_kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] * (1.0 + 2.0 ** -20)

    def pallas_min(x):
        return pl.pallas_call(
            _copy_kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
        )(x)

    if jax.default_backend() == "tpu":
        probe("pallas_copy_8x128", pallas_min, jnp.ones((8, 128), jnp.float32))
        # Context: the live 1-kernel whole-transform at the band floor.
        from gpu_fft_tpu.kernels.fused import whole_transform
        from gpu_fft_tpu.plan import get_whole_plan

        wp = get_whole_plan(1024, -1)
        probe(
            "pallas_whole_n1024",
            lambda x: whole_transform(x, None, wp)[0],
            jnp.ones((1, 1024), jnp.float32),
        )
        out["pallas_call_us"] = rows["pallas_copy_8x128"]["per_call_us"]

    from gpu_fft_tpu.utils.profiling import fft_forward_step

    probe("fft_n1024", fft_forward_step(1024), jnp.ones((1, 1024), jnp.float32))
    probe("fft_n4096", fft_forward_step(4096), jnp.ones((1, 4096), jnp.float32))

    floor = min(r["per_call_us"] for k, r in rows.items() if k.startswith(("scale", "dot")))
    out["chained_floor_us"] = floor
    out["rows"] = rows

    # ── Unchained per-dispatch wall time (host-visible latency) ─────────
    f = jax.jit(lambda x: x * one)
    x = jnp.ones((8, 128), jnp.float32)
    jax.block_until_ready(f(x))
    samples = []
    for _ in range(30):
        t0 = time.perf_counter()
        jax.block_until_ready(f(x))
        samples.append((time.perf_counter() - t0) * 1e6)
    out["unchained_dispatch_us"] = {
        "median": float(np.median(samples)),
        "min": float(np.min(samples)),
        "note": "includes host->device transport (axon tunnel where applicable); "
        "NOT a roofline term — chained timing cancels it",
    }
    print(f"[latency] chained floor: {floor:.3f} us")
    print(
        f"[latency] unchained dispatch: median {out['unchained_dispatch_us']['median']:.1f} us, "
        f"min {out['unchained_dispatch_us']['min']:.1f} us"
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
