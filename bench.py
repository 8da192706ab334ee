"""Benchmark harness: one JSON headline line on stdout, full matrix to
BENCH_DETAILS.json.

Configs mirror the reference benchmark suite (``benches/fft_bench.rs``):
scalar fwd/inv sweep over N, batched transforms, batch-vs-sequential
speedup, roundtrip, backend comparison (PALLAS vs the XLA vendor FFT — the
analog of ``benches/compare_bench.rs``'s WGPU-vs-MLX groups), plus the
accuracy gate (roundtrip error vs 5*log2(N)*eps, ``tests/roundtrip.rs:63``).

Timing methodology — chained on-device iteration:
    In this environment the TPU sits behind an async tunnel where
    ``block_until_ready`` returns before execution completes and a host
    readback costs ~28 ms, so naive per-call timing measures dispatch, not
    compute.  Instead each config runs x = step(x) inside ``lax.fori_loop``
    for k1 and k2 iterations (data-dependent chain — no elision possible for
    FFT custom calls), syncs with a scalar readback, and reports
    (T(k2) - T(k1)) / (k2 - k1): pure steady-state per-transform device time.
    Throughput = elements/second, matching Criterion's
    ``Throughput::Elements`` (``fft_bench.rs:76``).
"""

from __future__ import annotations

import json
import time

import numpy as np

# Reference headline: scalar fft N=65,536 at 69.73 Melem/s on M4 Mini/wgpu
# (reference README.md:171, BASELINE.md).
BASELINE_FFT_65536_MELEM_S = 69.73

RNG = np.random.default_rng(42)


def _chained_time(step, x0):
    """Median steady-state seconds per step(x) on device (see module doc)."""
    from gpu_fft_tpu.utils.profiling import chained_step_time

    return chained_step_time(step, x0, k1=50, k2=1050, reps=4)


def main() -> None:
    import jax
    import jax.numpy as jnp

    import gpu_fft_tpu as gf
    from gpu_fft_tpu.utils.profiling import (
        fft_forward_step,
        fft_inverse_step,
        fft_roundtrip_step,
        xla_fft_forward_step,
    )

    start = time.time()
    platform = jax.default_backend()
    details: dict = {
        "platform": platform,
        "device": str(jax.devices()[0]),
        "method": "chained fori_loop, (T(k2)-T(k1))/(k2-k1), scalar-readback sync",
        "configs": {},
    }

    def dev(shape):
        return jnp.asarray(RNG.standard_normal(shape).astype(np.float32))

    def record(name, step, x0, elems):
        import sys

        try:
            sec = _chained_time(step, x0)
            melem = elems / sec / 1e6
            details["configs"][name] = {"per_call_s": sec, "melem_per_s": melem}
            print(f"[bench] {name}: {sec * 1e6:.2f} us, {melem:.0f} Melem/s", file=sys.stderr, flush=True)
            return melem
        except Exception as e:  # keep the harness robust on odd platforms
            details["configs"][name] = {"error": str(e)[:300]}
            print(f"[bench] {name}: ERROR {str(e)[:120]}", file=sys.stderr, flush=True)
            return None

    fwd_step = fft_forward_step
    xla_step = xla_fft_forward_step
    inv_step = fft_inverse_step
    roundtrip_step = fft_roundtrip_step

    # ── Scalar forward sweep (fft_bench.rs SIZES + large-N extension) ───────
    for n in (1024, 4096, 16384, 65536, 1 << 20):
        record(f"fft_n{n}", fwd_step(n), dev((1, n)), n)

    # ── Inverse + roundtrip at the headline size ────────────────────────────
    record("ifft_n65536", inv_step(65536), dev((1, 65536)), 65536)
    record("roundtrip_n65536", roundtrip_step(65536), dev((1, 65536)), 65536)

    # ── Batched (fft_bench.rs BATCH_SIZES x BATCH_N) ────────────────────────
    record("fft_batch_b16_n65536", fwd_step(65536), dev((16, 65536)), 16 * 65536)
    record("fft_batch_b64_n4096", fwd_step(4096), dev((64, 4096)), 64 * 4096)

    # ── Backend comparison: XLA vendor FFT (compare_bench.rs analog) ────────
    record("xla_fft_n65536", xla_step(65536), dev((1, 65536)), 65536)
    record("xla_fft_batch_b16_n65536", xla_step(65536), dev((16, 65536)), 16 * 65536)

    # Batch-vs-sequential speedup (README.md:250-262): B back-to-back scalar
    # transforms vs one batched pass.
    c = details["configs"]
    try:
        seq = 64 * c["fft_n4096"]["per_call_s"]
        details["batch_vs_sequential_speedup_b64_n4096"] = seq / c["fft_batch_b64_n4096"]["per_call_s"]
    except KeyError:
        pass

    # ── Accuracy gate: roundtrip err <= 5*log2(N)*eps ───────────────────────
    # Protected per size like the timing configs: a failure here must not
    # discard the measured results.  The PALLAS backend is forced so env
    # overrides (e.g. GPU_FFT_TPU_BACKEND=native) cannot break the device API.
    eps32 = float(np.finfo(np.float32).eps)
    acc = {}
    for n in (1024, 4096, 65536, 1 << 20):
        try:
            xs_h = RNG.uniform(-1.0, 1.0, n).astype(np.float32)
            r, i = gf.fft_device(jnp.asarray(xs_h[None]), backend=gf.Backend.PALLAS)
            rr, _ = gf.ifft_device(r, i, backend=gf.Backend.PALLAS)
            err = float(np.abs(np.asarray(rr[0]) - xs_h).max())
            bound = float(5.0 * np.log2(n) * eps32)
            acc[f"n{n}"] = {"max_err": err, "bound": bound, "pass": bool(err <= bound)}
        except Exception as e:
            acc[f"n{n}"] = {"error": str(e)[:200], "pass": False}
    details["accuracy"] = acc
    details["accuracy_all_pass"] = all(v["pass"] for v in acc.values())
    details["wall_s"] = time.time() - start

    headline = (details["configs"].get("fft_n65536") or {}).get("melem_per_s", 0.0) or 0.0
    details["headline"] = {
        "metric": "fft_n65536_device_melem_per_s",
        "value": headline,
        "baseline": BASELINE_FFT_65536_MELEM_S,
    }
    with open("BENCH_DETAILS.json", "w") as f:
        json.dump(details, f, indent=2)

    print(
        json.dumps(
            {
                "metric": "fft_n65536_melem_per_s",
                "value": round(headline, 2),
                "unit": "Melem/s",
                "vs_baseline": round(headline / BASELINE_FFT_65536_MELEM_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
