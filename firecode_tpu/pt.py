"""Periodic-table data as flat numpy arrays indexed by atomic number.

TPU-first design note: element data lives in dense Z-indexed arrays so that
per-atom properties (masses, radii) lower onto the device as simple gathers
from an `atomnos i32[N]` array — no string handling ever reaches a kernel.

Capability parity with the reference's `pt` facade (firecode/pt.py:29-41),
which wraps symbol-keyed dicts. Radii are Cordero et al. (2008) covalent
radii; masses are standard atomic weights.
"""

from __future__ import annotations

import numpy as np

# fmt: off
_ELEMENTS: list[tuple[str, float, float]] = [
    # (symbol, mass [amu], covalent radius [Angstrom]); index = Z - 1
    ("H", 1.008, 0.31), ("He", 4.0026, 0.28),
    ("Li", 6.94, 1.28), ("Be", 9.0122, 0.96), ("B", 10.81, 0.84),
    ("C", 12.011, 0.76), ("N", 14.007, 0.71), ("O", 15.999, 0.66),
    ("F", 18.998, 0.57), ("Ne", 20.180, 0.58),
    ("Na", 22.990, 1.66), ("Mg", 24.305, 1.41), ("Al", 26.982, 1.21),
    ("Si", 28.085, 1.11), ("P", 30.974, 1.07), ("S", 32.06, 1.05),
    ("Cl", 35.45, 1.02), ("Ar", 39.948, 1.06),
    ("K", 39.098, 2.03), ("Ca", 40.078, 1.76), ("Sc", 44.956, 1.70),
    ("Ti", 47.867, 1.60), ("V", 50.942, 1.53), ("Cr", 51.996, 1.39),
    ("Mn", 54.938, 1.39), ("Fe", 55.845, 1.32), ("Co", 58.933, 1.26),
    ("Ni", 58.693, 1.24), ("Cu", 63.546, 1.32), ("Zn", 65.38, 1.22),
    ("Ga", 69.723, 1.22), ("Ge", 72.630, 1.20), ("As", 74.922, 1.19),
    ("Se", 78.971, 1.20), ("Br", 79.904, 1.20), ("Kr", 83.798, 1.16),
    ("Rb", 85.468, 2.20), ("Sr", 87.62, 1.95), ("Y", 88.906, 1.90),
    ("Zr", 91.224, 1.75), ("Nb", 92.906, 1.64), ("Mo", 95.95, 1.54),
    ("Tc", 98.0, 1.47), ("Ru", 101.07, 1.46), ("Rh", 102.91, 1.42),
    ("Pd", 106.42, 1.39), ("Ag", 107.87, 1.45), ("Cd", 112.41, 1.44),
    ("In", 114.82, 1.42), ("Sn", 118.71, 1.39), ("Sb", 121.76, 1.39),
    ("Te", 127.60, 1.38), ("I", 126.90, 1.39), ("Xe", 131.29, 1.40),
    ("Cs", 132.91, 2.44), ("Ba", 137.33, 2.15), ("La", 138.91, 2.07),
    ("Ce", 140.12, 2.04), ("Pr", 140.91, 2.03), ("Nd", 144.24, 2.01),
    ("Pm", 145.0, 1.99), ("Sm", 150.36, 1.98), ("Eu", 151.96, 1.98),
    ("Gd", 157.25, 1.96), ("Tb", 158.93, 1.94), ("Dy", 162.50, 1.92),
    ("Ho", 164.93, 1.92), ("Er", 167.26, 1.89), ("Tm", 168.93, 1.90),
    ("Yb", 173.05, 1.87), ("Lu", 174.97, 1.87), ("Hf", 178.49, 1.75),
    ("Ta", 180.95, 1.70), ("W", 183.84, 1.62), ("Re", 186.21, 1.51),
    ("Os", 190.23, 1.44), ("Ir", 192.22, 1.41), ("Pt", 195.08, 1.36),
    ("Au", 196.97, 1.36), ("Hg", 200.59, 1.32), ("Tl", 204.38, 1.45),
    ("Pb", 207.2, 1.46), ("Bi", 208.98, 1.48), ("Po", 209.0, 1.40),
    ("At", 210.0, 1.50), ("Rn", 222.0, 1.50), ("Fr", 223.0, 2.60),
    ("Ra", 226.0, 2.21), ("Ac", 227.0, 2.15), ("Th", 232.04, 2.06),
    ("Pa", 231.04, 2.00), ("U", 238.03, 1.96), ("Np", 237.0, 1.90),
    ("Pu", 244.0, 1.87), ("Am", 243.0, 1.80), ("Cm", 247.0, 1.69),
]
# fmt: on

MAX_Z = len(_ELEMENTS)

# Z-indexed arrays; index 0 is a padding slot (Z=0 means "no atom"), used so
# padded lanes in batched kernels contribute zero mass / zero radius.
SYMBOLS: np.ndarray = np.array(["X"] + [e[0] for e in _ELEMENTS])
MASSES: np.ndarray = np.array([0.0] + [e[1] for e in _ELEMENTS], dtype=np.float64)
COVALENT_RADII: np.ndarray = np.array([0.0] + [e[2] for e in _ELEMENTS], dtype=np.float64)

SYMBOL_TO_Z: dict[str, int] = {e[0]: z + 1 for z, e in enumerate(_ELEMENTS)}
SYMBOL_TO_Z["X"] = 0

TRANSITION_METALS: frozenset[str] = frozenset(
    SYMBOLS[z]
    for z in list(range(21, 31)) + list(range(39, 49)) + list(range(57, 81)) + list(range(89, 97))
    if z <= MAX_Z
)


class PeriodicTable:
    """Symbol/number facade; scalar lookups for host code, arrays for kernels."""

    symbols = SYMBOLS
    masses = MASSES
    covalent_radii = COVALENT_RADII

    def number(self, symbol: str) -> int:
        return SYMBOL_TO_Z[str(symbol).capitalize()]

    def symbol(self, z: int) -> str:
        return str(SYMBOLS[z])

    def mass(self, symbol: str) -> float:
        return float(MASSES[self.number(symbol)])

    def covalent_radius(self, symbol: str) -> float:
        return float(COVALENT_RADII[self.number(symbol)])


pt = PeriodicTable()


def atomnos_from_symbols(atoms: np.ndarray | list[str]) -> np.ndarray:
    """Vector symbol -> Z conversion for ingress I/O."""
    return np.array([pt.number(a) for a in atoms], dtype=np.int32)


def symbols_from_atomnos(atomnos: np.ndarray) -> np.ndarray:
    return SYMBOLS[np.asarray(atomnos)]
