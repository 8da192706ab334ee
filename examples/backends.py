"""Enumerate compiled-in backends and roundtrip through each
(mirrors reference ``examples/backends.rs:9-31``).

Run: python examples/backends.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import gpu_fft_tpu as gf


def main() -> None:
    x = np.array([0.0, 1.0, 2.0, 3.0, 2.0, 1.0, 0.0, -1.0], dtype=np.float32)
    print("Available backends:", [b.name for b in gf.available_backends()])
    for backend in gf.available_backends():
        re, im = gf.fft_with(x, backend)
        out = gf.ifft_with(re, im, backend)
        err = float(np.abs(out[: len(x)] - x).max())
        print(f"{backend.name:8s} roundtrip max error: {err:.3e}")


if __name__ == "__main__":
    main()
