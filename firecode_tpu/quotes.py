"""End-of-run quotes (cosmetic parity with firecode/quotes.py)."""

from __future__ import annotations

import random

QUOTES: list[tuple[str, str]] = [
    (
        "The underlying physical laws necessary for the mathematical theory of "
        "a large part of physics and the whole of chemistry are thus completely "
        "known.",
        "P. A. M. Dirac",
    ),
    (
        "Every attempt to employ mathematical methods in the study of chemical "
        "questions must be considered profoundly irrational.",
        "A. Comte (1830) — aged poorly",
    ),
    (
        "Nothing in life is to be feared, it is only to be understood.",
        "Marie Curie",
    ),
    (
        "A theory is something nobody believes, except the person who made it. "
        "An experiment is something everybody believes, except the person who "
        "made it.",
        "attributed to A. Einstein",
    ),
    (
        "Chemistry, unlike other sciences, sprang originally from delusions "
        "and superstitions, and was at its commencement exactly on a par with "
        "magic and astrology.",
        "Thomas Thomson",
    ),
    (
        "The conformers you prune today are the transition states you refine "
        "tomorrow.",
        "",
    ),
]


def random_quote() -> tuple[str, str]:
    return random.choice(QUOTES)
