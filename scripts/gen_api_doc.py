"""Generate docs/API.md from the live package: every public symbol with its
signature and docstring summary, grouped by area.

Run: python scripts/gen_api_doc.py  (CPU-only; no device work)
"""

from __future__ import annotations

import inspect
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

GROUPS = [
    ("Core transforms (reference parity)", [
        "fft", "ifft", "fft_batch", "ifft_batch", "fft_with", "ifft_with",
        "fft_native", "ifft_native", "fft_device", "ifft_device",
        "rfft", "irfft", "rfft_device", "irfft_device", "hfft", "ihfft",
        "next_power_of_two", "next_fast_len", "prev_fast_len", "warmup",
    ]),
    ("Backends", ["Backend", "available_backends", "default_backend", "describe_plan"]),
    ("2-D / N-D", ["fft2", "ifft2", "fft2_device", "ifft2_device", "fftn", "ifftn",
                   "fftn_device", "ifftn_device",
                   "rfft2", "irfft2", "rfft2_device", "irfft2_device",
                   "rfftn", "irfftn", "rfftn_device", "irfftn_device",
                   "hfft2", "ihfft2", "hfftn", "ihfftn",
                   "hfftn_device", "ihfftn_device"]),
    ("Exact arbitrary length", ["fft_exact", "ifft_exact", "fft_exact_device", "ifft_exact_device",
                                "czt", "czt_device", "zoom_fft", "zoom_fft_device",
                                "CZT", "ZoomFFT"]),
    ("Fast Hankel (FFTLog)", ["fht", "ifht", "fht_device", "ifht_device", "fhtoffset"]),
    ("scipy.fft / scipy.signal / scipy.ndimage drop-in namespaces", ["compat", "signal", "ndimage"]),
    ("Spectral estimation", ["psd", "psd_device", "power_spectrum_device",
                             "spectrogram", "spectrogram_device", "spectrogram_scipy",
                             "welch", "welch_device", "csd", "csd_device",
                             "coherence", "coherence_device",
                             "periodogram", "periodogram_device", "lombscargle"]),
    ("Time-frequency", ["stft", "stft_device", "istft", "istft_device", "stft_scipy", "istft_scipy", "window_table", "ShortTimeFFT", "closest_STFT_dual_window",
                        "check_COLA", "check_NOLA"]),
    ("Serving / AOT export", ["export_transform", "save_transform", "load_transform", "exported_call"]),
    ("DCT / DST", ["dct", "idct", "dst", "idst",
                   "dct_device", "idct_device", "dst_device", "idst_device",
                   "dctn", "idctn", "dctn_device", "idctn_device",
                   "dstn", "idstn", "dstn_device", "idstn_device"]),
    ("Convolution / correlation", ["fft_convolve", "fft_convolve_device", "fft_correlate",
                                   "oaconvolve", "oaconvolve_device",
                                   "fft_convolve2d", "fft_convolve2d_device", "fft_correlate2d",
                                   "convolve2d", "correlate2d", "choose_conv_method"]),
    ("Rank / local-statistics filters", ["medfilt", "medfilt2d", "order_filter", "wiener"]),
    ("FIR filtering", ["firwin", "firwin2", "firwin_2d", "kaiserord", "kaiser_beta", "kaiser_atten",
                       "minimum_phase", "fftfilt", "fftfilt_device", "filtfilt_fir",
                       "freqz_fir", "freqz", "FIRStream",
                       "savgol_coeffs", "savgol_filter",
                       "firls", "remez", "gammatone", "band_stop_obj"]),
    ("IIR filtering (block-state engine)", ["lfilter", "lfilter_device", "lfilter_zi",
                                            "filtfilt", "sosfilt", "sosfilt_zi", "sosfiltfilt"]),
    ("IIR design", ["butter", "cheby1", "cheby2", "ellip", "bessel", "iirfilter",
                    "buttord", "cheb1ord", "cheb2ord", "ellipord",
                    "iirnotch", "iirpeak", "iircomb", "bilinear", "zpk2tf", "zpk2sos",
                    "tf2zpk", "tf2sos", "sos2tf", "sos2zpk", "normalize", "BadCoefficients"]),
    ("Filter response analysis", ["freqz_zpk", "sosfreqz", "freqz_sos", "group_delay", "czt_points",
                                  "freqs", "freqs_zpk", "findfreqs"]),
    ("Analog prototypes / transforms", ["buttap", "cheb1ap", "cheb2ap", "ellipap", "besselap",
                                        "lp2lp", "lp2hp", "lp2bp", "lp2bs",
                                        "lp2lp_zpk", "lp2hp_zpk", "lp2bp_zpk", "lp2bs_zpk",
                                        "bilinear_zpk", "iirdesign"]),
    ("Peak detection", ["find_peaks", "peak_prominences", "peak_widths", "find_peaks_cwt",
                        "argrelextrema", "argrelmax", "argrelmin"]),
    ("LTI systems", ["lti", "dlti", "TransferFunction", "ZerosPolesGain", "StateSpace",
                     "lsim", "impulse", "step", "freqresp", "bode",
                     "dlsim", "dimpulse", "dstep", "dfreqresp", "dbode",
                     "cont2discrete", "tf2ss", "ss2tf", "zpk2ss", "ss2zpk",
                     "abcd_normalize", "place_poles",
                     "residue", "residuez", "invres", "invresz", "unique_roots"]),
    ("Waveforms / discrete utils", ["square", "sawtooth", "gausspulse", "sweep_poly",
                                    "unit_impulse", "max_len_seq", "detrend",
                                    "correlation_lags", "vectorstrength", "deconvolve",
                                    "lfiltic"]),
    ("Multirate", ["upfirdn", "upfirdn_device", "resample_poly",
                   "resample_poly_device", "decimate"]),
    ("Signal helpers", ["hilbert", "hilbert_device", "hilbert2",
                        "envelope", "envelope_device", "envelope_scipy",
                        "resample", "resample_device", "fftshift", "ifftshift",
                        "fftfreq", "rfftfreq"]),
    ("Splines", ["gauss_spline", "cspline1d", "qspline1d", "cspline1d_eval", "qspline1d_eval",
                 "cspline2d", "qspline2d", "sepfir2d", "spline_filter",
                 "symiirorder1", "symiirorder2"]),
]

PARALLEL = [
    "default_mesh", "fft_batch_sharded", "ifft_batch_sharded", "fft2_batch_sharded",
    "welch_sharded", "oaconvolve_sharded", "lfilter_sharded",
    "distributed_fft", "distributed_ifft",
    "fft2_sharded", "ifft2_sharded", "fftn_sharded", "ifftn_sharded",
]

MODELS = [
    "SpectralConv1d", "SpectralConv2d", "FNO1d", "FNO2d", "append_grid",
    "mse", "make_train_step", "make_data_parallel_step", "make_gspmd_step",
    "param_shardings", "fit",
]

UTILS = [
    "generate_sine_wave", "calculate_frequencies", "calculate_one_sided_frequencies",
    "find_dominant_frequencies", "fftfreq", "rfftfreq", "chirp",
]


def _sig(obj) -> str:
    try:
        return str(inspect.signature(obj))
    except (TypeError, ValueError):
        return "(...)"


def _summary(obj) -> str:
    doc = inspect.getdoc(obj) or ""
    first = doc.split("\n\n")[0].replace("\n", " ").strip()
    return first


def main() -> None:
    import gpu_fft_tpu as gf
    from gpu_fft_tpu import parallel, utils

    lines = [
        "# API reference",
        "",
        "Generated by `scripts/gen_api_doc.py` from the live package "
        f"(v{gf.__version__}).  Device variants (`*_device`) take/return JAX "
        "arrays, stay on device, and are jit-composable; their host "
        "counterparts accept anything array-like and return NumPy.",
        "",
    ]
    listed: set[str] = set()
    for title, names in GROUPS:
        lines += [f"## {title}", ""]
        for name in names:
            obj = getattr(gf, name)
            listed.add(name)
            if inspect.ismodule(obj):
                lines.append(f"- **`{name}`** (module) — {_summary(obj)}")
            elif inspect.isclass(obj):
                lines.append(f"- **`{name}{_sig(obj.__init__)}`** (class) — {_summary(obj)}")
            elif callable(obj):
                lines.append(f"- **`{name}{_sig(obj)}`** — {_summary(obj)}")
            else:
                lines.append(f"- **`{name}`** — {_summary(type(obj)) or repr(obj)}")
        lines.append("")

    lines += ["## Multi-chip (`gpu_fft_tpu.parallel`)", ""]
    for name in PARALLEL:
        obj = getattr(parallel, name)
        lines.append(f"- **`{name}{_sig(obj)}`** — {_summary(obj)}")
    lines.append("")

    lines += ["## Model family (`gpu_fft_tpu.models`)", ""]
    from gpu_fft_tpu import models

    for name in MODELS:
        obj = getattr(models, name)
        if inspect.isclass(obj):
            lines.append(f"- **`{name}`** (flax module) — {_summary(obj)}")
        else:
            lines.append(f"- **`{name}{_sig(obj)}`** — {_summary(obj)}")
    lines.append("")

    lines += ["## Host utilities (`gpu_fft_tpu.utils`)", ""]
    for name in UTILS:
        obj = getattr(utils, name)
        lines.append(f"- **`{name}{_sig(obj)}`** — {_summary(obj)}")
    lines.append("")

    missing = [n for n in gf.__all__
               if n not in listed and n not in ("utils", "__version__")]
    if missing:
        lines += ["## Ungrouped", ""]
        for name in missing:
            obj = getattr(gf, name)
            lines.append(f"- **`{name}`** — {_summary(obj) if callable(obj) else ''}")
        lines.append("")

    out = pathlib.Path("docs/API.md")
    out.write_text("\n".join(lines))
    print(f"wrote {out} ({len(lines)} lines, "
          f"{len(listed) + len(PARALLEL) + len(MODELS) + len(UTILS)} symbols)"
          + (f"; UNGROUPED: {missing}" if missing else ""))


if __name__ == "__main__":
    main()
