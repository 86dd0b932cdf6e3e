"""Typed exceptions for the workflow engine.

Same public exception names as the reference (firecode/errors.py:24-51) so
error-handling code ports directly.
"""


class FirecodeTPUError(Exception):
    """Base class for all framework errors."""


class ZeroCandidatesError(FirecodeTPUError):
    """All candidate structures were discarded at some pipeline stage."""


class InputError(FirecodeTPUError):
    """Malformed input file or inconsistent user options."""


class TriangleError(FirecodeTPUError):
    """Cannot build a triangle with the requested side lengths (cyclical embed)."""


class SegmentedGraphError(FirecodeTPUError):
    """Molecular graph has more than one connected component where one is required."""


class NoOrbitalError(FirecodeTPUError):
    """Reactive-atom orbital data requested but not present."""


class FatalError(FirecodeTPUError):
    """An optimization crashed or scrambled beyond recovery."""


class MissingExternalError(FirecodeTPUError):
    """An optional external binary/library (xtb, crest, packmol, rdkit) is unavailable."""
