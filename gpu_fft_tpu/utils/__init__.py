"""Signal-generation and frequency-analysis utilities (CPU, NumPy)."""

from .signal import (
    calculate_frequencies,
    calculate_one_sided_frequencies,
    chirp,
    fftfreq,
    find_dominant_frequencies,
    generate_sine_wave,
    rfftfreq,
)

__all__ = [
    "generate_sine_wave",
    "calculate_frequencies",
    "calculate_one_sided_frequencies",
    "find_dominant_frequencies",
    "fftfreq",
    "rfftfreq",
    "chirp",
]
