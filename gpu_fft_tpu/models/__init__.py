"""Model family built on the library's device transforms.

Fourier Neural Operators (1-D and 2-D) with flax modules, plus functional
train-step builders (single-chip and data-parallel over a mesh).  Imported
lazily so the core FFT surface never pays the flax/optax import cost.
"""

from __future__ import annotations

__all__ = [
    "SpectralConv1d",
    "SpectralConv2d",
    "FNO1d",
    "FNO2d",
    "append_grid",
    "mse",
    "make_train_step",
    "make_data_parallel_step",
    "make_gspmd_step",
    "param_shardings",
    "fit",
]

_FNO = {"SpectralConv1d", "SpectralConv2d", "FNO1d", "FNO2d", "append_grid"}
_TRAIN = {
    "mse",
    "make_train_step",
    "make_data_parallel_step",
    "make_gspmd_step",
    "param_shardings",
    "fit",
}


def __getattr__(name):
    if name in _FNO:
        from . import fno

        return getattr(fno, name)
    if name in _TRAIN:
        from . import train

        return getattr(train, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(__all__)
