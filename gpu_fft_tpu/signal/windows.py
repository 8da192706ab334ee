"""``gpu_fft_tpu.signal.windows`` — drop-in for ``scipy.signal.windows``.

Re-exports the f64 window implementations from :mod:`gpu_fft_tpu.ops.windows`
(which live under ``ops`` so the device estimators in ``ops.stft`` can use
them without a circular import).  Usage matches scipy::

    from gpu_fft_tpu.signal import windows
    w = windows.dpss(512, 2.5)
"""

from ..ops.windows import *  # noqa: F401,F403
from ..ops.windows import __all__  # noqa: F401
