"""Calculator dispatch by name.

Replaces the reference's Dispatcher (firecode/dispatcher.py:38-342): instead
of mapping names to ASE calculator objects + per-structure opt functions, a
name maps to a *batched* Calculator factory. The native LITEFF calculator runs
fully on device; XTB is a host escape hatch around the external `xtb` binary
(subprocess per structure, used for parity checking when the binary exists —
reference firecode/calculators/xtb.py).
"""

from __future__ import annotations

from shutil import which

import numpy as np

from firecode_tpu.calculators.base import Calculator
from firecode_tpu.calculators.forcefield import LiteFF
from firecode_tpu.errors import MissingExternalError

KNOWN_CALCULATORS = (
    "GFNFF", "GFNFF-TOPO", "LITEFF", "LITEFF-R", "MLIP", "XTB", "TBLITE",
    "ORCA", "AIMNET2", "UMA",
)


class Dispatcher:
    def __init__(self, calculator: str) -> None:
        calculator = calculator.upper()
        if calculator not in KNOWN_CALCULATORS:
            raise SyntaxError(
                f"'{calculator}' is not a recognized calculator "
                f"(known: {', '.join(KNOWN_CALCULATORS)}). Use the CALC keyword "
                "or FIRECODE_TPU_CALCULATOR."
            )
        self.calculator = calculator

    def get_batch_calc(
        self,
        atomnos: np.ndarray,
        coords: np.ndarray,
        graph=None,
        charge: int = 0,
        solvent: str | None = None,
        charge_site=None,
        site_charge_target: float | None = None,
    ) -> Calculator:
        """Build a batched calculator for the given system.

        charge_site / site_charge_target: ion-workflow charge-transfer
        constraint (GFNFF only; see GFNFFTopology.site_b) — the pKa routine
        passes the reacting functional group so net-charge delocalization
        does not scale with molecule size."""
        if self.calculator in ("GFNFF", "GFNFF-TOPO"):
            from firecode_tpu.calculators.gfnff import GFNFF

            # GFNFF-TOPO: published-convention fixed setup charges — no
            # O(N^3) EEQ solve under the optimization step loop
            calc = GFNFF(
                atomnos, coords, graph=graph, charge=charge,
                eeq="topo" if self.calculator == "GFNFF-TOPO" else "variational",
                charge_site=charge_site,
                site_charge_target=site_charge_target,
            )
            if solvent is not None:
                from firecode_tpu.calculators.solvation import solvate

                calc = solvate(
                    calc, atomnos, solvent, total_charge=charge,
                    charge_site=charge_site,
                    site_charge_target=site_charge_target,
                )
            return calc
        if self.calculator == "LITEFF":
            calc = LiteFF(atomnos, coords, graph=graph, charge=charge)
            if solvent is not None:
                from firecode_tpu.calculators.solvation import solvate

                calc = solvate(calc, atomnos, solvent, total_charge=charge)
            return calc
        if self.calculator == "LITEFF-R":
            from firecode_tpu.calculators.reactive_ff import ReactiveFF

            calc = ReactiveFF(atomnos, charge=charge)
            if solvent is not None:
                from firecode_tpu.calculators.solvation import solvate

                calc = solvate(calc, atomnos, solvent, total_charge=charge)
            return calc
        if self.calculator == "MLIP":
            from firecode_tpu.calculators.mlip import load_mlip

            calc = load_mlip(atomnos)
            if solvent is not None:
                from firecode_tpu.calculators.solvation import solvate

                calc = solvate(calc, atomnos, solvent, total_charge=charge)
            return calc
        if self.calculator == "XTB":
            from firecode_tpu.calculators.xtb_io import XTBHostCalculator

            return XTBHostCalculator(atomnos, charge=charge, solvent=solvent)
        if self.calculator == "TBLITE":
            from firecode_tpu.calculators.tblite_io import load_tblite

            return load_tblite(atomnos, charge=charge, solvent=solvent)
        if self.calculator == "AIMNET2":
            from firecode_tpu.calculators.aimnet2 import load_aimnet2, solvate_host

            calc = load_aimnet2(atomnos, charge=charge)
            if solvent is not None:
                calc = solvate_host(calc, atomnos, solvent, total_charge=charge)
            return calc
        if self.calculator == "UMA":
            from firecode_tpu.calculators.aimnet2 import load_uma, solvate_host

            calc = load_uma(atomnos, charge=charge)
            if solvent is not None:
                calc = solvate_host(calc, atomnos, solvent, total_charge=charge)
            return calc
        raise MissingExternalError(
            f"Calculator {self.calculator} requires an external engine that is "
            "not available in this environment. Native options: GFNFF "
            "(generated FF), LITEFF (classical FF), LITEFF-R (reactive), MLIP "
            "(neural potential, bundled CHNO checkpoint or "
            "FIRECODE_TPU_MLIP_PATH); external: XTB when the binary is "
            "installed, AIMNET2/UMA with user-supplied weights."
        )


def xtb_available() -> bool:
    import os

    return which(os.environ.get("FIRECODE_TPU_XTB_PATH", "xtb")) is not None
