"""Host escape hatch: energies/forces/optimizations via the external `xtb`
binary (GFN-FF/GFN1/GFN2-xTB).

Capability parity with the reference's subprocess driver
(firecode/calculators/xtb.py:39-347): file-based I/O in a scratch directory,
constraint input generation, trajectory/energy parsing. Exposed both as a
per-structure optimizer (`xtb_opt`) and as a (host-looped) batched Calculator
for parity checking the native device path. Raises MissingExternalError when
the binary is absent.
"""

from __future__ import annotations

import os
import re
import subprocess
import tempfile
from pathlib import Path

import numpy as np

from firecode_tpu.calculators.base import Calculator
from firecode_tpu.errors import MissingExternalError
from firecode_tpu.io.xyz import write_xyz
from firecode_tpu.pt import symbols_from_atomnos
from firecode_tpu.units import EH_TO_KCAL


def _xtb_path() -> str:
    path = os.environ.get("FIRECODE_TPU_XTB_PATH", "xtb")
    from shutil import which

    if which(path) is None:
        raise MissingExternalError(
            "xtb binary not found. Set FIRECODE_TPU_XTB_PATH or install xtb."
        )
    return path


def _write_constrain_file(
    path: Path,
    constrained_indices=None,
    constrained_distances=None,
    force_constant: float = 1.0,
) -> None:
    lines = ["$constrain", f"  force constant={force_constant}"]
    if constrained_indices is not None:
        for k, (i1, i2) in enumerate(constrained_indices):
            target = (
                constrained_distances[k]
                if constrained_distances is not None and constrained_distances[k]
                else "auto"
            )
            lines.append(f"  distance: {i1 + 1}, {i2 + 1}, {target}")
    lines.append("$end")
    path.write_text("\n".join(lines) + "\n")


def _parse_energy(output: str) -> float:
    """Total energy in kcal/mol from xtb stdout."""
    m = re.findall(r"TOTAL ENERGY\s+(-?\d+\.\d+)\s+Eh", output)
    if not m:
        raise ValueError("Could not parse xtb total energy")
    return float(m[-1]) * EH_TO_KCAL


def _run_xtb(args: list[str], cwd: Path) -> str:
    result = subprocess.run(
        [_xtb_path(), *args],
        cwd=cwd,
        capture_output=True,
        text=True,
        env={**os.environ, "OMP_NUM_THREADS": "1"},
    )
    if result.returncode != 0:
        raise RuntimeError(f"xtb failed:\n{result.stdout[-2000:]}\n{result.stderr[-2000:]}")
    return result.stdout


def xtb_opt(
    atomnos: np.ndarray,
    coords: np.ndarray,
    charge: int = 0,
    method: str = "GFN2-xTB",
    solvent: str | None = None,
    constrained_indices=None,
    constrained_distances=None,
    conv_thr: str = "tight",
    **_,
) -> tuple[np.ndarray, float, bool]:
    """Constrained geometry optimization -> (coords, energy kcal/mol, ok)."""
    atoms = symbols_from_atomnos(atomnos)
    gfn = {"GFN-FF": "--gfnff", "GFN1-XTB": "--gfn 1", "GFN2-XTB": "--gfn 2"}.get(
        method.upper(), "--gfn 2"
    )
    with tempfile.TemporaryDirectory(prefix="fc_xtb_") as tmp:
        tmpdir = Path(tmp)
        write_xyz(tmpdir / "in.xyz", atoms, coords)
        args = ["in.xyz", "--opt", conv_thr, "--chrg", str(charge), *gfn.split()]
        if solvent:
            args += ["--alpb", solvent]
        if constrained_indices is not None and len(constrained_indices):
            _write_constrain_file(
                tmpdir / "constraints.inp", constrained_indices, constrained_distances
            )
            args += ["--input", "constraints.inp"]
        try:
            out = _run_xtb(args, tmpdir)
            energy = _parse_energy(out)
            from firecode_tpu.io.xyz import read_xyz

            _, opt_coords, _ = read_xyz(tmpdir / "xtbopt.xyz")
            return opt_coords[0], energy, True
        except (RuntimeError, FileNotFoundError, ValueError):
            return coords, 1e10, False


def xtb_energy_and_gradient(
    atomnos: np.ndarray,
    coords: np.ndarray,
    charge: int = 0,
    method: str = "GFN2-xTB",
    solvent: str | None = None,
) -> tuple[float, np.ndarray]:
    """Single-point energy (kcal/mol) + forces (kcal/mol/A)."""
    atoms = symbols_from_atomnos(atomnos)
    gfn = {"GFN-FF": "--gfnff", "GFN1-XTB": "--gfn 1", "GFN2-XTB": "--gfn 2"}.get(
        method.upper(), "--gfn 2"
    )
    with tempfile.TemporaryDirectory(prefix="fc_xtb_") as tmp:
        tmpdir = Path(tmp)
        write_xyz(tmpdir / "in.xyz", atoms, coords)
        args = ["in.xyz", "--grad", "--chrg", str(charge), *gfn.split()]
        if solvent:
            args += ["--alpb", solvent]
        out = _run_xtb(args, tmpdir)
        energy = _parse_energy(out)
        grad_file = tmpdir / "gradient"
        forces = np.zeros_like(coords)
        if grad_file.exists():
            rows = []
            for line in grad_file.read_text().splitlines():
                parts = line.split()
                if len(parts) == 3 and all(_is_float(p) for p in parts):
                    rows.append([float(p.replace("D", "E")) for p in parts])
            if len(rows) >= len(coords):
                from firecode_tpu.units import BOHR_TO_ANGSTROM

                grad = np.array(rows[-len(coords):])  # Eh/bohr
                forces = -grad * EH_TO_KCAL / BOHR_TO_ANGSTROM
        return energy, forces


def _is_float(s: str) -> bool:
    try:
        float(s.replace("D", "E"))
        return True
    except ValueError:
        return False


class XTBHostCalculator(Calculator):
    """Batched-interface calculator that loops xtb subprocesses on host.

    Slow by design — exists as the parity oracle for the native device path
    (SURVEY.md section 2.2 xtb row: "keep an optional host-subprocess escape
    hatch for parity checks").
    """

    def __init__(self, atomnos: np.ndarray, charge: int = 0, solvent: str | None = None):
        self.atomnos = np.asarray(atomnos)
        self.charge = charge
        self.solvent = solvent
        super().__init__(self._energy_np, name="xtb")

    def _energy_np(self, coords):
        raise NotImplementedError("XTBHostCalculator is not traceable; use energy()")

    def energy(self, coords) -> np.ndarray:
        coords = np.asarray(coords)
        if coords.ndim == 2:
            coords = coords[None]
        return np.array(
            [
                xtb_energy_and_gradient(
                    self.atomnos, c, self.charge, solvent=self.solvent
                )[0]
                for c in coords
            ]
        )

    def energy_and_forces(self, coords):
        coords = np.asarray(coords)
        squeeze = coords.ndim == 2
        if squeeze:
            coords = coords[None]
        out = [
            xtb_energy_and_gradient(self.atomnos, c, self.charge, solvent=self.solvent)
            for c in coords
        ]
        e = np.array([o[0] for o in out])
        f = np.stack([o[1] for o in out])
        if squeeze:
            return e[0], f[0]
        return e, f
