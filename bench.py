"""Benchmark harness: one JSON headline line on stdout, full matrix to
BENCH_DETAILS.json.

Configs mirror the reference benchmark suite (``benches/fft_bench.rs``):
scalar fwd/inv sweep over N, batched transforms, batch-vs-sequential speedup,
roundtrip, backend comparison (PALLAS vs the XLA vendor FFT — the analog of
``benches/compare_bench.rs``'s WGPU-vs-MLX groups), plus the accuracy gate
(roundtrip error vs 5*log2(N)*eps, ``tests/roundtrip.rs:63``).

Timing methodology: device-resident arrays, per-call ``block_until_ready``
(the analog of the reference's synchronous ``client.read_one`` per call),
warm-up excluded like Criterion's warm-up phase (``fft_bench.rs:71-72``).
Throughput = elements/second, matching ``Throughput::Elements``
(``fft_bench.rs:76``).
"""

from __future__ import annotations

import json
import time

import numpy as np

# Reference headline: scalar fft N=65,536 at 69.73 Melem/s on M4 Mini/wgpu
# (reference README.md:171, BASELINE.md).
BASELINE_FFT_65536_MELEM_S = 69.73

RNG = np.random.default_rng(42)


def _time_call(fn, *args, min_time=0.6, warmup=3):
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    # Estimate, then run for ~min_time seconds.
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    est = time.perf_counter() - t0
    iters = max(5, int(min_time / max(est, 1e-6)))
    iters = min(iters, 2000)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    times = np.array(times)
    return {
        "mean_s": float(times.mean()),
        "median_s": float(np.median(times)),
        "std_s": float(times.std()),
        "iters": int(iters),
    }


def main() -> None:
    import jax
    import jax.numpy as jnp

    import gpu_fft_tpu as gf
    from gpu_fft_tpu.backends import xla

    platform = jax.default_backend()
    details: dict = {"platform": platform, "device": str(jax.devices()[0]), "configs": {}}

    def record(name, stats, elems):
        stats = dict(stats)
        stats["melem_per_s"] = elems / stats["median_s"] / 1e6
        details["configs"][name] = stats
        return stats["melem_per_s"]

    def dev(shape):
        return jnp.asarray(RNG.standard_normal(shape).astype(np.float32))

    # ── Scalar forward sweep (fft_bench.rs SIZES) ───────────────────────────
    for n in (256, 1024, 4096, 16384, 65536):
        x = dev((1, n))
        record(f"fft_n{n}", _time_call(gf.fft_device, x), n)

    # ── Scalar inverse + roundtrip at 65536 ─────────────────────────────────
    n = 65536
    x = dev((1, n))
    yr, yi = gf.fft_device(x)
    record(f"ifft_n{n}", _time_call(gf.ifft_device, yr, yi), n)

    def roundtrip(x):
        r, i = gf.fft_device(x)
        return gf.ifft_device(r, i)

    record(f"roundtrip_n{n}", _time_call(roundtrip, x), n)

    # ── Batched (fft_bench.rs BATCH_SIZES x BATCH_N) ────────────────────────
    for b, nn in ((16, 65536), (64, 4096), (16, 16384)):
        xb = dev((b, nn))
        record(f"fft_batch_b{b}_n{nn}", _time_call(gf.fft_device, xb), b * nn)

    # Batch-vs-sequential speedup (README.md:250-262 pattern), B=64 N=4096.
    xb = dev((64, 4096))
    batch_t = details["configs"]["fft_batch_b64_n4096"]["median_s"]
    xs = dev((1, 4096))

    def seq64(x):
        outs = [gf.fft_device(x) for _ in range(64)]
        return outs[-1]

    seq = _time_call(seq64, xs, min_time=0.4)
    details["configs"]["fft_sequential_64_n4096"] = seq
    details["batch_vs_sequential_speedup"] = seq["median_s"] / batch_t

    # ── Large-N (beyond the reference's max benchmarked size) ───────────────
    x = dev((1, 1 << 20))
    record("fft_n1048576", _time_call(gf.fft_device, x), 1 << 20)

    # ── Backend comparison: PALLAS vs XLA vendor FFT (compare_bench.rs) ─────
    for n in (4096, 65536):
        x = dev((1, n))
        record(f"xla_fft_n{n}", _time_call(xla.forward, x), n)

    # ── Accuracy gate: roundtrip err <= 5*log2(N)*eps ───────────────────────
    eps32 = float(np.finfo(np.float32).eps)
    acc = {}
    for n in (1024, 4096, 65536, 1 << 20):
        xs_h = RNG.uniform(-1.0, 1.0, n).astype(np.float32)
        r, i = gf.fft_device(jnp.asarray(xs_h[None]))
        rr, _ = gf.ifft_device(r, i)
        err = float(np.abs(np.asarray(rr[0]) - xs_h).max())
        bound = float(5.0 * np.log2(n) * eps32)
        acc[f"n{n}"] = {"max_err": err, "bound": bound, "pass": bool(err <= bound)}
    details["accuracy"] = acc
    details["accuracy_all_pass"] = all(v["pass"] for v in acc.values())

    headline = details["configs"]["fft_n65536"]["melem_per_s"]
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
