"""Run the test suite on the real TPU and record the result
(bench-results/tpu_suite.json, merged into BENCH_DETAILS by bench.py).

The reference runs its whole suite against the real device
(`/root/reference/tests/fft.rs:8-21`).  This repo's CI-default is the
8-device CPU mesh (tests/conftest.py); this script is the on-hardware
run.  Two environment realities shape it:

* First-compiles pay tens of seconds each through the remote-compile
  tunnel; the persistent cache (conftest enables it for non-cpu
  platforms) makes repeat runs tractable.  Pass ``--files`` to scope.
* The axon tunnel cannot read back complex64 device arrays
  ("UNIMPLEMENTED: TPU backend error" — .claude/skills/verify/SKILL.md
  gotcha), so the scipy/numpy compat surface (which RETURNS complex
  jnp arrays) is structurally unrunnable under the tunnel even though
  the underlying split-complex device kernels are TPU-exercised.  The
  default file set is therefore the reference-model suite: every file
  that mirrors the reference's own test surface (fft/ifft/roundtrip/
  batch/parity, reference tests/*.rs) plus the device-kernel-path files.
  On a non-tunnel TPU runtime the full suite runs: pass --files tests.

Usage:  python scripts/run_tpu_suite.py [--files f1 f2 ...]
"""

from __future__ import annotations

import json
import pathlib
import re
import subprocess
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parent.parent

# The reference's suite surface (SURVEY §4) + the kernel-path files.
DEFAULT_FILES = [
    "tests/test_fft.py",
    "tests/test_ifft.py",
    "tests/test_roundtrip.py",
    "tests/test_fft_batch.py",
    "tests/test_ifft_batch.py",
    "tests/test_parity.py",
    "tests/test_psd_utils.py",
    "tests/test_whole_kernel.py",
    "tests/test_kernel_paths.py",
    "tests/test_half_spectrum.py",
    "tests/test_irfft_half.py",
]


def main() -> None:
    files = sys.argv[sys.argv.index("--files") + 1 :] if "--files" in sys.argv else DEFAULT_FILES
    env = dict(GPU_FFT_TPU_TEST_PLATFORM="axon")
    import os

    full_env = {**os.environ, **env}
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", *files, "-q", "--tb=line"],
        cwd=ROOT,
        env=full_env,
        capture_output=True,
        text=True,
    )
    wall = time.time() - t0
    tail = "\n".join(proc.stdout.strip().splitlines()[-15:])
    m = re.search(r"(\d+) passed", proc.stdout)
    f = re.search(r"(\d+) failed", proc.stdout)
    s = re.search(r"(\d+) skipped", proc.stdout)
    out = {
        "platform": "axon (TPU v5e via tunnel)",
        "files": files,
        "passed": int(m.group(1)) if m else 0,
        "failed": int(f.group(1)) if f else 0,
        "skipped": int(s.group(1)) if s else 0,
        "wall_s": round(wall, 1),
        "returncode": proc.returncode,
        "scope_note": (
            "reference-model suite files (SURVEY section 4 surface + device kernel paths); "
            "the scipy-compat files return complex jnp arrays, which the axon tunnel cannot "
            "read back (UNIMPLEMENTED complex64 transfer) - run the full suite on a "
            "non-tunnel TPU runtime"
        ),
        "tail": tail,
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    dest = ROOT / "bench-results" / "tpu_suite.json"
    dest.write_text(json.dumps(out, indent=1))
    print(json.dumps({k: out[k] for k in ("passed", "failed", "skipped", "wall_s")}))
    print(tail)
    print(f"wrote {dest}")


if __name__ == "__main__":
    main()
