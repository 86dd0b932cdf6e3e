"""Conformer-ensemble container.

The ensemble is the framework's central data structure: a batch of conformers
of one chemical system, `coords f64[B, N, 3]` + `atomnos i32[N]` + optional
`energies f64[B]` (kcal/mol, as in the reference workflow). Host-side the
container holds numpy arrays and provides the same workflow verbs as the
reference (firecode/ensemble.py:46-297): energy pruning with a dynamic
threshold, the MOI -> RMSD -> rotamer-corrected-RMSD similarity cascade, and
xyz round-tripping. All numeric work inside those verbs runs on device through
the jitted kernels in `firecode_tpu.prune` / `firecode_tpu.ops`.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable, Iterable

import numpy as np

from firecode_tpu.io.xyz import parse_energy, read_xyz, write_xyz
from firecode_tpu.pt import MASSES, atomnos_from_symbols, symbols_from_atomnos
from firecode_tpu.units import EH_TO_KCAL


@dataclass
class Ensemble:
    atoms: np.ndarray  # str[N]
    coords: np.ndarray  # f64[B, N, 3]
    filename: str = ""
    basename: str = ""
    atomnos: np.ndarray = field(default_factory=lambda: np.array([], dtype=np.int32))
    energies: np.ndarray = field(default_factory=lambda: np.array([], dtype=np.float64))
    logfunction: Callable[[str], None] | None = print

    def __post_init__(self) -> None:
        self.atoms = np.asarray(self.atoms)
        self.coords = np.asarray(self.coords, dtype=np.float64)
        if self.coords.ndim == 2:
            self.coords = self.coords[None]
        if self.atomnos.size == 0:
            self.atomnos = atomnos_from_symbols(self.atoms)

    # ---------------------------------------------------------------- I/O

    @classmethod
    def from_xyz(cls, file: str | Path, read_energies: bool = False) -> "Ensemble":
        atoms, coords, comments = read_xyz(file)
        energies = np.array([], dtype=np.float64)
        if read_energies:
            parsed = [parse_energy(c) for c in comments]
            if all(e is not None for e in parsed):
                # parse_energy normalizes comment-line energies to Hartree;
                # the Ensemble contract (like read_energies()) is kcal/mol
                energies = np.array(parsed, dtype=np.float64) * EH_TO_KCAL
        return cls(
            atoms=atoms,
            coords=coords,
            filename=str(file),
            basename=Path(str(file)).stem,
            energies=energies,
        )

    @classmethod
    def from_arrays(cls, atomnos: np.ndarray, coords: np.ndarray, **kw) -> "Ensemble":
        return cls(
            atoms=symbols_from_atomnos(atomnos),
            coords=coords,
            atomnos=np.asarray(atomnos, dtype=np.int32),
            **kw,
        )

    def to_xyz(self, file: str | Path) -> None:
        # write_xyz labels frame energies "Eh" — convert from the kcal/mol
        # the container holds so from_xyz/read_energies round-trip exactly
        energies = (
            self.energies / EH_TO_KCAL
            if len(self.energies) == len(self.coords)
            else None
        )
        write_xyz(file, self.atoms, self.coords, energies=energies, title=self.basename)

    def read_energies(self, verbose: bool = True) -> bool:
        """Parse energies (Eh) from self.filename comment lines into kcal/mol."""
        from firecode_tpu.io.xyz import read_xyz_energies

        energies = read_xyz_energies(self.filename)
        if energies is None:
            if verbose:
                self.log(f"--> Could not parse energies for {self.filename} - skipping.")
            return False
        self.energies = energies * EH_TO_KCAL
        return True

    # ------------------------------------------------------------ helpers

    def log(self, msg: str) -> None:
        if self.logfunction is not None:
            self.logfunction(msg)

    def __len__(self) -> int:
        return len(self.coords)

    @property
    def masses(self) -> np.ndarray:
        return MASSES[self.atomnos]

    @property
    def rel_energies(self) -> np.ndarray:
        return self.energies - np.min(self.energies)

    def apply_mask(self, attributes: Iterable[str], mask: np.ndarray) -> None:
        """Compact the listed per-structure attributes with a boolean keep mask."""
        for attr in attributes:
            value = getattr(self, attr, None)
            if value is not None and len(value) == len(mask):
                setattr(self, attr, value[mask])

    def sort_by_energy(self) -> None:
        order = np.argsort(self.energies, kind="stable")
        self.energies = self.energies[order]
        self.coords = self.coords[order]

    def analysis(self, T: float = 298.15, group: bool = False) -> dict:
        """Population analysis (Boltzmann populations, S_conf, G_conf) of
        this ensemble — the cregen / CREST --entropy summary, natively.
        With group=True, rotamer duplicates are collapsed first and their
        multiplicities weight the unique conformers."""
        from firecode_tpu.ensemble_thermo import (
            ensemble_analysis,
            rotamer_degeneracies,
        )

        if self.energies is None or len(self.energies) != len(self.coords):
            raise ValueError("ensemble has no energies (read_energies=True?)")
        if not group:
            return ensemble_analysis(self.energies, T=T)
        idx, deg, e_group = rotamer_degeneracies(
            self.coords, self.atomnos, energies=self.energies
        )
        res = ensemble_analysis(e_group, T=T, degeneracies=deg)
        res["conformer_indices"] = idx
        res["degeneracies"] = deg
        return res

    # ------------------------------------------------------------ pruning

    def dynamic_energy_thr(self, kcal_thr: float = 10.0, keep_min: float = 0.1) -> float:
        """Smallest threshold >= kcal_thr that keeps > keep_min of the structures.

        Mirrors the reference's adaptive window (firecode/ensemble.py:134-169).
        """
        active = len(self.coords)
        rel = self.rel_energies
        if np.count_nonzero(rel < kcal_thr) / active > keep_min:
            return kcal_thr
        for thr in np.sort(rel[rel > kcal_thr]):
            if np.count_nonzero(rel < thr) / active > keep_min:
                self.log(
                    f"--> Dynamically adjusted energy threshold to {thr:.1f} kcal/mol to "
                    f"retain at least {keep_min * 100:.0f}% of structures."
                )
                return float(thr)
        return kcal_thr

    def energy_pruning(self, kcal_thr: float = 10.0, verbose: bool = True) -> None:
        """Drop structures more than kcal_thr above the minimum (dynamic floor)."""
        thr = self.dynamic_energy_thr(kcal_thr)
        mask = self.rel_energies < thr
        self.apply_mask(("coords", "energies"), mask)
        if verbose and not mask.all():
            kept = int(np.count_nonzero(mask))
            self.log(
                f"Discarded {len(mask) - kept} candidates for energy ({kept} left, "
                f"{100 * kept / len(mask):.1f}% kept, threshold {thr:.1f} kcal/mol)"
            )

    def similarity_pruning(
        self,
        moi: bool = True,
        rmsd: bool = True,
        rmsd_rot_corr: bool = False,
        rmsd_thr: float = 0.5,
        max_dE: float = 1.0,
        verbose: bool = True,
    ) -> None:
        """MOI -> RMSD -> (optional) rotamer-corrected-RMSD device cascade.

        Mirrors firecode/ensemble.py:185-276: each stage greedily keeps the
        first of any similar pair, with energy gating (pairs further apart than
        max_dE kcal/mol are never considered duplicates) when energies exist.
        """
        from firecode_tpu.prune import prune_by_moi, prune_by_rmsd, prune_by_rmsd_rot_corr

        if verbose:
            self.log("--> Similarity Processing")
        before = len(self.coords)
        energies = self.energies if len(self.energies) == len(self.coords) else None

        if moi:
            n0 = len(self.coords)
            mask = prune_by_moi(self.coords, self.atomnos, energies=energies, max_dE=max_dE)
            self.apply_mask(("coords", "energies"), mask)
            if verbose and len(self.coords) < n0:
                self.log(
                    f"Discarded {n0 - len(self.coords)} candidates for MOI similarity "
                    f"({len(self.coords)} left)"
                )
            energies = self.energies if energies is not None else None

        if rmsd:
            n0 = len(self.coords)
            mask = prune_by_rmsd(
                self.coords, self.atomnos, rmsd_thr=rmsd_thr, energies=energies, max_dE=max_dE
            )
            self.apply_mask(("coords", "energies"), mask)
            if verbose and len(self.coords) < n0:
                self.log(
                    f"Discarded {n0 - len(self.coords)} candidates for RMSD similarity "
                    f"({len(self.coords)} left)"
                )
            energies = self.energies if energies is not None else None

            if rmsd_rot_corr:
                # the reference skips rot-corr above 1e3 structures
                # (firecode/ensemble.py:247-270); the tiled kernel scales,
                # so the ceiling is deleted (LET-style note at large sizes)
                if verbose and len(self.coords) > 1e3:
                    self.log(
                        f"Symmetry-corrected RMSD pruning at {len(self.coords)} "
                        "structures (reference CPU ceiling of 1e3 does not apply)"
                    )
                n0 = len(self.coords)
                mask = prune_by_rmsd_rot_corr(
                    self.coords,
                    self.atomnos,
                    rmsd_thr=rmsd_thr,
                    energies=energies,
                    max_dE=max_dE,
                )
                self.apply_mask(("coords", "energies"), mask)
                if verbose and len(self.coords) < n0:
                    self.log(
                        f"Discarded {n0 - len(self.coords)} candidates for "
                        f"symmetry-corrected RMSD similarity ({len(self.coords)} left)"
                    )

        if verbose and len(self.coords) == before:
            self.log("All structures passed the similarity check.")
