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
    constrained_angles_indices=None,
    constrained_angles_values=None,
    constrained_dihedrals_indices=None,
    constrained_dihedrals_values=None,
    force_constant: float = 1.0,
) -> None:
    lines = ["$constrain", f"  force constant={force_constant}"]

    def target_of(values, k):
        # a 0.0-degree dihedral/angle target is a real request, not "auto"
        if values is None or values[k] is None:
            return "auto"
        return values[k]

    if constrained_indices is not None:
        for k, (i1, i2) in enumerate(constrained_indices):
            lines.append(
                f"  distance: {i1 + 1}, {i2 + 1}, {target_of(constrained_distances, k)}"
            )
    if constrained_angles_indices is not None:
        for k, (a, b, c) in enumerate(constrained_angles_indices):
            lines.append(
                f"  angle: {a + 1}, {b + 1}, {c + 1}, "
                f"{target_of(constrained_angles_values, k)}"
            )
    if constrained_dihedrals_indices is not None:
        for k, (a, b, c, d) in enumerate(constrained_dihedrals_indices):
            lines.append(
                f"  dihedral: {a + 1}, {b + 1}, {c + 1}, {d + 1}, "
                f"{target_of(constrained_dihedrals_values, k)}"
            )
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


def _xtb_opt_once(
    atomnos: np.ndarray,
    coords: np.ndarray,
    charge: int = 0,
    method: str = "GFN2-xTB",
    solvent: str | None = None,
    constrained_indices=None,
    constrained_distances=None,
    constrained_angles_indices=None,
    constrained_angles_values=None,
    constrained_dihedrals_indices=None,
    constrained_dihedrals_values=None,
    conv_thr: str = "tight",
    maxiter: int | None = None,
    force_constant: float = 1.0,
) -> tuple[np.ndarray, float, bool]:
    """One xtb optimization run -> (coords, energy kcal/mol, ok)."""
    atoms = symbols_from_atomnos(atomnos)
    gfn = {"GFN-FF": "--gfnff", "GFN1-XTB": "--gfn 1", "GFN2-XTB": "--gfn 2"}.get(
        method.upper(), "--gfn 2"
    )
    with tempfile.TemporaryDirectory(prefix="fc_xtb_") as tmp:
        tmpdir = Path(tmp)
        write_xyz(tmpdir / "in.xyz", atoms, coords)
        args = ["in.xyz", "--opt", conv_thr, "--chrg", str(charge), *gfn.split()]
        if maxiter:
            args += ["--cycles", str(maxiter)]
        if solvent:
            args += ["--alpb", solvent]
        has_constraints = any(
            x is not None and len(x)
            for x in (
                constrained_indices,
                constrained_angles_indices,
                constrained_dihedrals_indices,
            )
        )
        if has_constraints:
            _write_constrain_file(
                tmpdir / "constraints.inp",
                constrained_indices,
                constrained_distances,
                constrained_angles_indices,
                constrained_angles_values,
                constrained_dihedrals_indices,
                constrained_dihedrals_values,
                force_constant=force_constant,
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


def xtb_opt(
    atomnos: np.ndarray,
    coords: np.ndarray,
    charge: int = 0,
    method: str = "GFN2-xTB",
    solvent: str | None = None,
    constrained_indices=None,
    constrained_distances=None,
    conv_thr: str = "tight",
    recursive_stepsize: float = 0.3,
    spring_constant: float = 0.25,
    **kwargs,
) -> tuple[np.ndarray, float, bool]:
    """Constrained geometry optimization -> (coords, energy kcal/mol, ok).

    Anti-scrambling constrained approach (reference firecode/calculators/
    xtb.py:120-171, implemented iteratively instead of recursively): when a
    distance constraint's target is further than `recursive_stepsize` from
    the current geometry, the distance is walked toward the target in
    `recursive_stepsize` rungs — each rung a short loose optimization with a
    SOFT spring (`spring_constant`) followed by snapping the second atom
    along the bond vector — so the rest of the molecule relaxes gradually
    instead of being yanked across a large gap in one stiff pull."""
    coords = np.asarray(coords, dtype=np.float64).copy()
    if constrained_indices is not None and constrained_distances is not None:
        targets = list(constrained_distances)
        for k, (pair, target) in enumerate(zip(constrained_indices, targets)):
            if target is None or len(pair) != 2:
                continue
            a, b = int(pair[0]), int(pair[1])
            d = float(np.linalg.norm(coords[b] - coords[a]))
            guard = 0
            while abs(d - target) > recursive_stepsize and guard < 64:
                # hold every OTHER constraint at its CURRENT distance during
                # this rung — pinning them to their (possibly far) final
                # targets would yank them across the full gap in one pull,
                # exactly the scrambling the ladder exists to prevent
                rung = [
                    float(np.linalg.norm(coords[int(p[1])] - coords[int(p[0])]))
                    if j != k and t is not None and len(p) == 2
                    else t
                    for j, (p, t) in enumerate(zip(constrained_indices, targets))
                ]
                rung[k] = d - recursive_stepsize * np.sign(d - target)
                coords, _, ok = _xtb_opt_once(
                    atomnos, coords, charge=charge, method=method, solvent=solvent,
                    constrained_indices=constrained_indices,
                    constrained_distances=rung,
                    conv_thr="loose", maxiter=50, force_constant=spring_constant,
                    **kwargs,
                )
                if not ok:
                    return coords, 1e10, False
                d = float(np.linalg.norm(coords[b] - coords[a]))
                guard += 1
            # snap the stretched atom exactly onto the target distance
            vec = coords[b] - coords[a]
            d = float(np.linalg.norm(vec))
            if d > 1e-9:
                coords[b] -= vec / d * (d - target)

    return _xtb_opt_once(
        atomnos, coords, charge=charge, method=method, solvent=solvent,
        constrained_indices=constrained_indices,
        constrained_distances=constrained_distances,
        conv_thr=conv_thr, **kwargs,
    )


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

    host_only = True

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
