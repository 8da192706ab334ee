"""Batched forward-transform tests (mirrors reference ``tests/fft_batch.rs``)."""

import numpy as np
from conftest import EPSILON, assert_slice_approx

import gpu_fft_tpu as gf


def test_batch_matches_scalar(rng):
    # Batch result == scalar result on the same padded input
    # (tests/fft_batch.rs:17-41).
    signals = [rng.standard_normal(64).astype(np.float32) for _ in range(4)]
    batch = gf.fft_batch(signals)
    for s, (br, bi) in zip(signals, batch):
        sr, si = gf.fft(s)
        assert_slice_approx(br, sr, eps=EPSILON, label="batch vs scalar real")
        assert_slice_approx(bi, si, eps=EPSILON, label="batch vs scalar imag")


def test_mixed_lengths_pad_to_longest():
    # All signals pad to next_pow2(longest) (src/fft.rs:170-174).
    signals = [np.ones(100, np.float32), np.ones(700, np.float32), np.ones(4, np.float32)]
    batch = gf.fft_batch(signals)
    assert all(r.shape == (1024,) and i.shape == (1024,) for r, i in batch)
    # Each equals the scalar FFT of the same signal (scalar pads to its own
    # pow2, so compare against explicit padding).
    for s, (br, bi) in zip(signals, batch):
        padded = np.zeros(1024, np.float32)
        padded[: len(s)] = s
        ref = np.fft.fft(padded.astype(np.float64))
        assert_slice_approx(br, ref.real, eps=EPSILON * 700, label="mixed real")
        assert_slice_approx(bi, ref.imag, eps=EPSILON * 700, label="mixed imag")


def test_per_signal_independence():
    # Interleaved impulse/DC signals stay independent
    # (tests/fft_batch.rs:206-225).
    n = 32
    impulse = np.zeros(n, np.float32)
    impulse[0] = 1.0
    dc = np.ones(n, np.float32)
    batch = gf.fft_batch([impulse, dc, impulse, dc])
    for b in (0, 2):
        assert_slice_approx(batch[b][0], np.ones(n), label=f"impulse[{b}]")
        assert_slice_approx(batch[b][1], np.zeros(n), label=f"impulse imag[{b}]")
    for b in (1, 3):
        expected = np.zeros(n)
        expected[0] = n
        assert_slice_approx(batch[b][0], expected, label=f"dc[{b}]")


def test_empty_batch():
    assert gf.fft_batch([]) == []


def test_batch_of_one_matches_scalar(rng):
    x = rng.standard_normal(256).astype(np.float32)
    [(br, bi)] = gf.fft_batch([x])
    sr, si = gf.fft(x)
    assert_slice_approx(br, sr, label="single-batch real")
    assert_slice_approx(bi, si, label="single-batch imag")


def test_large_batch_64x64(rng):
    # 64 signals of 64 samples in one pass (tests/fft_batch.rs:184-200).
    signals = [rng.standard_normal(64).astype(np.float32) for _ in range(64)]
    batch = gf.fft_batch(signals)
    assert len(batch) == 64
    for s, (br, bi) in zip(signals, batch):
        ref = np.fft.fft(s.astype(np.float64))
        assert_slice_approx(br, ref.real, eps=EPSILON, label="64x64 real")
        assert_slice_approx(bi, ref.imag, eps=EPSILON, label="64x64 imag")


def test_batch_impulse_dc_sine_zeros():
    n = 64
    t = np.arange(n)
    impulse = np.zeros(n, np.float32)
    impulse[0] = 1.0
    sine = np.sin(2 * np.pi * t / n).astype(np.float32)
    batch = gf.fft_batch([impulse, np.ones(n, np.float32), sine, np.zeros(n, np.float32)])
    assert_slice_approx(batch[0][0], np.ones(n), label="impulse")
    assert batch[1][0][0] == np.float32(n) or abs(batch[1][0][0] - n) < EPSILON * n
    assert abs(batch[2][1][1] - (-n / 2)) < EPSILON * n
    assert_slice_approx(batch[3][0], np.zeros(n), label="zeros")


def test_batch_linearity(rng):
    x = rng.standard_normal(128).astype(np.float32)
    a = 4.0
    [(r1, i1), (r2, i2)] = gf.fft_batch([x, a * x])
    assert_slice_approx(r2, a * r1, eps=EPSILON * 10, label="batch linearity real")
    assert_slice_approx(i2, a * i1, eps=EPSILON * 10, label="batch linearity imag")


def test_batch_trivial_lengths():
    # All signals empty/length-1 (src/fft.rs:173-186).
    batch = gf.fft_batch([np.array([], np.float32), np.array([5.0], np.float32)])
    assert len(batch) == 2
    assert batch[0][0].shape == (1,) and batch[0][0][0] == 0.0
    assert batch[1][0][0] == 5.0


def test_batch_fourstep_size(rng):
    # Batch through the fused four-step path (n = 4096).
    signals = [rng.standard_normal(4096).astype(np.float32) for _ in range(3)]
    batch = gf.fft_batch(signals)
    for s, (br, bi) in zip(signals, batch):
        ref = np.fft.fft(s.astype(np.float64))
        scale = np.abs(ref).max()
        assert np.abs(br - ref.real).max() / scale < 1e-5
        assert np.abs(bi - ref.imag).max() / scale < 1e-5
