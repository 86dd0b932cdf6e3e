"""Gated AIMNet2 / UMA machine-learning-potential loaders.

Reference parity: firecode/dispatcher.py:131-185 loads AIMNet2 through the
optional `aimnet` package, and firecode/calculators/ase_uma.py:32-78 loads a
UMA model through the optional `fairchem` package from a user-supplied file
(FIRECODE_PATH_TO_UMA_MODEL). Neither package nor any pretrained weights are
redistributable, so both loaders are gated with MissingExternalError — the
same pattern as the xtb/CREST/packmol interfaces.

Beyond the reference, a plain-TorchScript escape hatch loads user-supplied
AIMNet2 archives (.jpt/.pt) DIRECTLY with torch.jit.load (torch-cpu ships in
this environment), so no `aimnet` install is needed when the user has the
weights file: point FIRECODE_TPU_AIMNET2_PATH at it. The TorchScript models
use AIMNet2's public calling convention — a dict with

    coord   f[B, N, 3]  Angstrom
    numbers i64[B, N]   atomic numbers
    charge  f[B]        total molecular charge

returning a dict with "energy" f[B] (eV); forces come from torch autograd
(exact -dE/dx) unless the model already returns a "forces" entry.

Solvation: the reference composes delta solvation onto ML calculators via
tblite (solvation_delta_calc.py:38-246, the "opt" implementation). Here the
native differentiable GB+SASA term (calculators/solvation.py) plays that
role: `solvate_host` adds its energy AND exact gradient to the host
calculator's results, so optimizations run on the solvated surface.
"""

from __future__ import annotations

import os
from typing import Callable

import numpy as np

from firecode_tpu.calculators.base import Calculator
from firecode_tpu.errors import MissingExternalError
from firecode_tpu.units import EV_TO_KCAL

_UNIT_TO_KCAL = {
    "ev": EV_TO_KCAL,
    "hartree": 627.5096080305927,
    "kcal": 1.0,
}


class TorchScriptMLCalculator(Calculator):
    """Host calculator around a TorchScript neural potential (AIMNet2
    calling convention). Batched: one torch call evaluates the whole
    [B, N, 3] batch; forces are exact autograd gradients. Not traceable by
    JAX — optimizer loops treat it like XTBHostCalculator (host hatch)."""

    host_only = True

    def __init__(
        self,
        model,
        atomnos: np.ndarray,
        charge: float = 0.0,
        energy_unit: str = "ev",
        name: str = "aimnet2",
    ):
        import torch

        self._torch = torch
        self._model = model
        self.atomnos = np.asarray(atomnos)
        self.charge = float(charge)
        try:
            self._to_kcal = _UNIT_TO_KCAL[energy_unit.lower()]
        except KeyError:
            raise ValueError(
                f"energy_unit {energy_unit!r} not in {sorted(_UNIT_TO_KCAL)}"
            ) from None
        self._numbers = torch.tensor(self.atomnos, dtype=torch.int64)
        super().__init__(self._energy_np, name=name)

    def _energy_np(self, coords):
        raise NotImplementedError(f"{self.name} is not traceable; use energy()")

    def _call(self, coords: np.ndarray, grad: bool):
        torch = self._torch
        coords = np.asarray(coords, dtype=np.float64)
        squeeze = coords.ndim == 2
        if squeeze:
            coords = coords[None]
        b, n = coords.shape[0], coords.shape[1]
        coord = torch.tensor(coords, dtype=torch.float32, requires_grad=grad)
        data = {
            "coord": coord,
            "numbers": self._numbers.unsqueeze(0).expand(b, n),
            "charge": torch.full((b,), self.charge, dtype=torch.float32),
        }
        out = self._model(data)
        e = out["energy"].reshape(b)
        f = None
        if grad:
            if "forces" in out:
                f = out["forces"].detach()
            else:
                (g,) = self._torch.autograd.grad(e.sum(), coord)
                f = -g
        e_np = e.detach().cpu().numpy().astype(np.float64) * self._to_kcal
        f_np = (
            None
            if f is None
            else f.cpu().numpy().astype(np.float64) * self._to_kcal
        )
        if squeeze:
            return e_np[0], (None if f_np is None else f_np[0])
        return e_np, f_np

    def energy(self, coords) -> np.ndarray:
        e, _ = self._call(coords, grad=False)
        return e

    def energy_and_forces(self, coords):
        e, f = self._call(coords, grad=True)
        return e, f


class ASEHostCalculator(Calculator):
    """Host loop around any ASE calculator object (UMA/FAIRChem path).
    ASE reports eV and eV/Angstrom; converted to kcal/mol here."""

    host_only = True

    def __init__(self, ase_calc, atomnos: np.ndarray, charge: float = 0.0, name: str = "ase"):
        try:
            from ase import Atoms  # noqa: F401
        except ImportError:
            raise MissingExternalError(
                "The UMA/ASE path needs the `ase` package (pip install ase). "
                "Native alternatives: CALC=GFNFF / MLIP."
            ) from None
        self._ase_calc = ase_calc
        self.atomnos = np.asarray(atomnos)
        self.charge = float(charge)
        super().__init__(self._energy_np, name=name)

    def _energy_np(self, coords):
        raise NotImplementedError(f"{self.name} is not traceable; use energy()")

    def _one(self, c: np.ndarray, forces: bool):
        from ase import Atoms

        atoms = Atoms(numbers=self.atomnos, positions=np.asarray(c, dtype=float))
        atoms.info["charge"] = self.charge
        atoms.calc = self._ase_calc
        e = float(atoms.get_potential_energy()) * EV_TO_KCAL
        if not forces:
            return e, None
        return e, np.asarray(atoms.get_forces(), dtype=np.float64) * EV_TO_KCAL

    def energy(self, coords) -> np.ndarray:
        coords = np.asarray(coords)
        if coords.ndim == 2:
            return np.array([self._one(coords, False)[0]])
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


class _SolvatedHostCalculator(Calculator):
    """Host ML calculator + the native differentiable GB+SASA term — the
    reference's "opt"-mode delta solvation (solvation_delta_calc.py:38-246)
    with the native model supplying both energy and exact gradient."""

    host_only = True

    def __init__(self, gas: Calculator, atomnos: np.ndarray, solvent: str, total_charge: float):
        import jax
        import jax.numpy as jnp

        from firecode_tpu.calculators.solvation import solvation_energy_fn

        self._gas = gas
        fn = solvation_energy_fn(np.asarray(atomnos), solvent, total_charge)
        self._solv_e = jax.jit(jax.vmap(fn))
        self._solv_eg = jax.jit(jax.vmap(jax.value_and_grad(fn)))
        self._jnp = jnp
        super().__init__(gas._energy_fn, name=f"{gas.name}/{solvent}")

    def energy(self, coords) -> np.ndarray:
        coords = np.asarray(coords)
        squeeze = coords.ndim == 2
        batch = coords[None] if squeeze else coords
        e = np.asarray(self._gas.energy(batch)) + np.asarray(
            self._solv_e(self._jnp.asarray(batch))
        )
        return e[0] if squeeze else e

    def energy_and_forces(self, coords):
        coords = np.asarray(coords)
        squeeze = coords.ndim == 2
        batch = coords[None] if squeeze else coords
        e_g, f_g = self._gas.energy_and_forces(batch)
        e_s, g_s = self._solv_eg(self._jnp.asarray(batch))
        e = np.asarray(e_g) + np.asarray(e_s)
        f = np.asarray(f_g) - np.asarray(g_s)
        if squeeze:
            return e[0], f[0]
        return e, f


def solvate_host(
    calc: Calculator, atomnos: np.ndarray, solvent: str, total_charge: float = 0.0
) -> Calculator:
    """Compose a host (non-traceable) calculator with native delta solvation."""
    return _SolvatedHostCalculator(calc, atomnos, solvent, total_charge)


def load_aimnet2(
    atomnos: np.ndarray,
    charge: float = 0.0,
    method: str | None = None,
    logfunction: Callable[[str], None] | None = None,
) -> Calculator:
    """AIMNet2 calculator: `aimnet` package if importable, else a TorchScript
    archive at FIRECODE_TPU_AIMNET2_PATH (torch.jit.load — no aimnet install
    needed). Mirrors reference dispatcher.py:131-185."""
    path = os.environ.get("FIRECODE_TPU_AIMNET2_PATH", "")
    try:
        from aimnet.calculators import AIMNet2ASE  # type: ignore

        ase_calc = AIMNet2ASE(method or "aimnet2")
        if logfunction is not None:
            logfunction("--> AIMNet2 calculator loaded via the aimnet package (CPU)")
        return ASEHostCalculator(ase_calc, atomnos, charge=charge, name="aimnet2")
    except ImportError:
        pass
    if path:
        import torch

        if not os.path.isfile(path):
            raise FileNotFoundError(
                f'Invalid AIMNet2 model path: FIRECODE_TPU_AIMNET2_PATH="{path}"'
            )
        model = torch.jit.load(path, map_location="cpu")
        model.eval()
        if logfunction is not None:
            logfunction(f"--> AIMNet2 TorchScript model loaded from {path} (CPU)")
        unit = os.environ.get("FIRECODE_TPU_AIMNET2_UNITS", "ev")
        return TorchScriptMLCalculator(
            model, atomnos, charge=charge, energy_unit=unit, name="aimnet2"
        )
    raise MissingExternalError(
        "CALC=AIMNET2 needs either the `aimnet` package (pip install aimnet[ase]) "
        "or a TorchScript model file via FIRECODE_TPU_AIMNET2_PATH=<model.jpt>. "
        "Native alternatives: CALC=GFNFF (generated FF) or CALC=MLIP "
        "(bundled neural potential)."
    )


def load_uma(
    atomnos: np.ndarray,
    charge: float = 0.0,
    method: str | None = None,
    logfunction: Callable[[str], None] | None = None,
) -> Calculator:
    """UMA calculator via fairchem from a user-supplied model file
    (FIRECODE_TPU_UMA_PATH, or the reference's FIRECODE_PATH_TO_UMA_MODEL).
    Mirrors reference calculators/ase_uma.py:32-78."""
    try:
        from fairchem.core import FAIRChemCalculator  # type: ignore
        from fairchem.core.units.mlip_unit import load_predict_unit  # type: ignore
    except ImportError:
        raise MissingExternalError(
            "CALC=UMA needs the `fairchem-core` package (pip install fairchem-core) "
            "and a model file via FIRECODE_TPU_UMA_PATH. Native alternatives: "
            "CALC=GFNFF or CALC=MLIP."
        ) from None
    path = os.environ.get("FIRECODE_TPU_UMA_PATH") or os.environ.get(
        "FIRECODE_PATH_TO_UMA_MODEL", ""
    )
    if not os.path.isfile(path):
        raise FileNotFoundError(
            f'Invalid UMA model path: FIRECODE_TPU_UMA_PATH="{path}"'
        )
    predictor = load_predict_unit(path, device="cpu")
    task = (method or os.environ.get("FIRECODE_TPU_DEFAULT_LEVEL_UMA", "omol")).lower()
    if logfunction is not None:
        logfunction(f"--> Loaded UMA/{task.upper()} model from {path} (CPU)")
    return ASEHostCalculator(
        FAIRChemCalculator(predictor, task_name=task), atomnos, charge=charge, name="uma"
    )
