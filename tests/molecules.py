"""Tiny test molecules — re-exported from the package's sample builders."""

from firecode_tpu.sample_molecules import build_alkane, build_ethanol

__all__ = ["build_alkane", "build_ethanol"]
