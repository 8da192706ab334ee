"""Full benchmark sweep -> raw JSON for the report generator.

The exhaustive analog of the reference's Criterion suite
(``benches/fft_bench.rs``: scalar/batch/radix sweeps; ``compare_bench.rs``:
backend comparison).  ``bench.py`` at the repo root is the driver's quick
headline harness; this script runs the full matrix and writes
``bench-results/raw_<timestamp>.json`` for ``export_report.py``.

Usage: python scripts/bench_sweep.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

SIZES = [256, 1024, 4096, 16384, 65536, 262144]
BATCHES = [(16, 65536), (64, 4096), (16, 16384), (4, 262144)]


def chained_time(step, x0):
    from gpu_fft_tpu.utils.profiling import chained_step_time

    return chained_step_time(step, x0, k1=50, k2=1050, reps=4)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true", help="fewer configs")
    parser.add_argument("--out", default=None)
    # Criterion-style baselines (reference scripts/bench.sh:8-9,32):
    parser.add_argument("--save-baseline", default=None, metavar="NAME",
                        help="also store results as bench-results/baselines/NAME.json")
    parser.add_argument("--baseline", default=None, metavar="NAME",
                        help="compare against a stored baseline and print deltas")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from gpu_fft_tpu.utils.profiling import (
        fft_forward_step,
        fft_inverse_step,
        fft_roundtrip_step,
        xla_fft_forward_step,
        xla_fft_inverse_step,
        xla_fft_roundtrip_step,
    )

    rng = np.random.default_rng(7)
    sizes = SIZES[:4] if args.quick else SIZES
    batches = BATCHES[:2] if args.quick else BATCHES

    def dev(shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32))

    def fwd(n, backend):
        return xla_fft_forward_step(n) if backend == "xla" else fft_forward_step(n)

    def inv(n, backend):
        return xla_fft_inverse_step(n) if backend == "xla" else fft_inverse_step(n)

    try:
        commit = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], capture_output=True, text=True
        ).stdout.strip()
    except OSError:
        commit = "unknown"

    results = {
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
        "commit": commit,
        "platform": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "entries": [],
    }

    def run(name, kind, backend, b, n, step):
        try:
            sec = chained_time(step, dev((b, n)))
            melem = b * n / sec / 1e6
            results["entries"].append(
                {
                    "name": name,
                    "kind": kind,
                    "backend": backend,
                    "batch": b,
                    "n": n,
                    "per_call_us": sec * 1e6,
                    "melem_per_s": melem,
                }
            )
            print(f"{name:36s} {sec * 1e6:9.2f} us  {melem:10.0f} Melem/s", flush=True)
        except Exception as e:
            print(f"{name:36s} ERROR {str(e)[:80]}", flush=True)

    def roundtrip(n, backend):
        return xla_fft_roundtrip_step(n) if backend == "xla" else fft_roundtrip_step(n)

    for n in sizes:
        for backend in ("pallas", "xla"):
            run(f"fft/{backend}/n{n}", "fft", backend, 1, n, fwd(n, backend))
    for n in ([4096, 65536] if not args.quick else [4096]):
        for backend in ("pallas", "xla"):
            run(f"ifft/{backend}/n{n}", "ifft", backend, 1, n, inv(n, backend))
    for b, n in batches:
        for backend in ("pallas", "xla"):
            run(f"fft_batch/{backend}/b{b}_n{n}", "fft_batch", backend, b, n, fwd(n, backend))
    # Native CPU backend rows (the reference's 3-way backend comparison,
    # compare_bench.rs / README.md:134-150 — wgpu vs cuda vs mlx analog).
    from gpu_fft_tpu.backends import native as native_backend

    if native_backend.is_available() and not args.quick:
        for n in (4096, 65536):
            xh = rng.standard_normal((1, n)).astype(np.float32)
            try:
                native_backend.forward(xh)  # warm
                t0 = time.perf_counter()
                iters = 50
                for _ in range(iters):
                    native_backend.forward(xh)
                sec = (time.perf_counter() - t0) / iters
                results["entries"].append(
                    {
                        "name": f"fft/native/n{n}",
                        "kind": "fft",
                        "backend": "native",
                        "batch": 1,
                        "n": n,
                        "per_call_us": sec * 1e6,
                        "melem_per_s": n / sec / 1e6,
                    }
                )
                print(f"{'fft/native/n' + str(n):36s} {sec * 1e6:9.2f} us  {n / sec / 1e6:10.0f} Melem/s", flush=True)
            except Exception as e:
                print(f"fft/native/n{n} ERROR {str(e)[:60]}", flush=True)

    # Batch-size sweep at fixed N (reference README.md:225-244 group).
    if not args.quick:
        for b in (1, 4, 16, 64):
            run(f"fft_batchsize/pallas/b{b}_n4096", "fft_batchsize", "pallas", b, 4096, fwd(4096, "pallas"))
        # Roundtrip groups (reference README.md:283-298).
        for n in (4096, 65536):
            run(f"roundtrip/pallas/n{n}", "roundtrip", "pallas", 1, n, roundtrip(n, "pallas"))
        run("roundtrip/xla/n65536", "roundtrip", "xla", 1, 65536, roundtrip(65536, "xla"))

    out = args.out or f"bench-results/raw_{time.strftime('%Y%m%d_%H%M%S')}.json"
    pathlib.Path(out).parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out}")

    base_dir = pathlib.Path("bench-results/baselines")
    if args.save_baseline:
        base_dir.mkdir(parents=True, exist_ok=True)
        (base_dir / f"{args.save_baseline}.json").write_text(json.dumps(results, indent=2))
        print(f"saved baseline '{args.save_baseline}'")
    if args.baseline:
        path = base_dir / f"{args.baseline}.json"
        if not path.is_file():
            print(f"no baseline named '{args.baseline}'")
        else:
            old = {e["name"]: e for e in json.loads(path.read_text())["entries"]}
            print(f"vs baseline '{args.baseline}':")
            for e in results["entries"]:
                o = old.get(e["name"])
                if o:
                    delta = (e["per_call_us"] - o["per_call_us"]) / o["per_call_us"] * 100
                    marker = "+" if delta >= 0 else ""
                    print(f"  {e['name']:36s} {marker}{delta:6.1f}% "
                          f"({o['per_call_us']:.2f} -> {e['per_call_us']:.2f} us)")


if __name__ == "__main__":
    main()
