"""Public transform and spectral-analysis operations."""
