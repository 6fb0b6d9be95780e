"""Native C++ runtime helpers (built via Makefile; loaded with ctypes).

This package marker exists so packaging ships the prebuilt .so files and
sources (pyproject.toml package-data); every call site has a pure-NumPy
fallback when the libraries are absent.
"""
