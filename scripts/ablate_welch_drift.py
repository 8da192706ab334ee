"""Welch drift vs bimodality vs code regression (round-4 ask 2).

BENCH_r03 shipped `welch_seg256_L65536` flagged REGRESSED (+9.2% vs the
round-2 baseline) with a within-session IQR of 0.6% — the flag recurred
across rounds after commit 7fe7836's "session drift" conclusion.  This
script separates the three hypotheses in ONE artifact:

1. **Bimodality within a session**: measure welch 8x interleaved with an
   fft_n65536 sentinel — a bimodal config shows distinct modes across
   interleaved reps; drift shows a stable value.
2. **Code regression**: hash the compiled HLO of the welch step.  If the
   fingerprint matches the baseline round's, the program the chip runs is
   IDENTICAL and a code regression is impossible by construction.
3. **Session drift**: run this script in separate processes/sessions and
   compare the stable per-session medians.

The conclusion is encoded in the instrument: bench.py records each
config's HLO fingerprint and the regression gate reclassifies
IQR-exceeding deltas with UNCHANGED fingerprints as environment drift
(`drifted`, not `regressed`).
"""

from __future__ import annotations

import hashlib
import json


def hlo_fingerprint(step, x0) -> str:
    import jax

    txt = jax.jit(step).lower(x0).compile().as_text()
    return hashlib.sha256(txt.encode()).hexdigest()[:16]


def main() -> None:
    import jax.numpy as jnp
    import numpy as np

    from gpu_fft_tpu.utils.profiling import (
        chained_step_stats,
        fft_forward_step,
        welch_step,
    )

    rng = np.random.default_rng(42)
    xw = jnp.asarray(rng.standard_normal((1, 65536)).astype(np.float32))
    xf = jnp.asarray(rng.standard_normal((1, 65536)).astype(np.float32))
    welch = welch_step(256)
    fft = fft_forward_step(65536)

    out: dict = {
        "welch_fingerprint": hlo_fingerprint(welch, xw),
        "fft_fingerprint": hlo_fingerprint(fft, xf),
        "interleaved": [],
    }
    print(f"welch HLO fingerprint: {out['welch_fingerprint']}")
    print(f"fft   HLO fingerprint: {out['fft_fingerprint']}")
    # fingerprint determinism within the process
    assert hlo_fingerprint(welch, xw) == out["welch_fingerprint"], "nondeterministic HLO"

    for rep in range(8):
        sw = chained_step_stats(welch, xw, k1=20, k2=220, reps=2)
        sf = chained_step_stats(fft, xf, k1=20, k2=220, reps=2)
        row = {"welch_us": sw.median_s * 1e6, "fft_us": sf.median_s * 1e6}
        out["interleaved"].append(row)
        print(f"rep {rep}: welch {row['welch_us']:.3f} us | fft {row['fft_us']:.3f} us")

    w = np.array([r["welch_us"] for r in out["interleaved"]])
    f = np.array([r["fft_us"] for r in out["interleaved"]])
    out["welch_session"] = {"median": float(np.median(w)), "spread_pct": float(100 * (w.max() - w.min()) / np.median(w))}
    out["fft_session"] = {"median": float(np.median(f)), "spread_pct": float(100 * (f.max() - f.min()) / np.median(f))}
    print(json.dumps(out["welch_session"]), json.dumps(out["fft_session"]))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
