"""Multi-conformer molecule model for embedding (host side).

Capability parity with the reference's Hypermolecule/Pivot
(firecode/hypermolecule_class.py:89-335) and the embedder's pivot setup
(firecode/embedder.py:904-989): a molecule is an ensemble of conformers plus
a molecular graph, per-conformer reactive-atom lobes, and per-conformer
pivots (vectors connecting two lobes, used by the cyclical embed).

Everything here stays numpy/host — pivots per conformer are O(10) objects.
The embed algorithms lower them to batched arrays.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Callable, Sequence

import networkx as nx
import numpy as np

from firecode_tpu.embed.orbitals import ReactiveAtom, build_reactive_atom
from firecode_tpu.ensemble import Ensemble
from firecode_tpu.graphs import graphize


@dataclass
class Pivot:
    """Vector connecting two orbital lobes (possibly of the same atom)."""

    start: np.ndarray
    end: np.ndarray
    start_atom: ReactiveAtom
    end_atom: ReactiveAtom
    index1: int  # lobe index on start_atom
    index2: int  # lobe index on end_atom

    def __post_init__(self) -> None:
        self.pivot = self.start - self.end
        self.meanpoint = (self.start + self.end) / 2.0
        self.norm = float(np.linalg.norm(self.pivot))


def is_sigmatropic(
    graph: nx.Graph,
    coords: np.ndarray,
    reactive_atoms: dict[int, ReactiveAtom],
) -> bool:
    """Two close sp2-like reactive atoms linked by a conjugated path
    (firecode/graph_manipulations.py:43-80)."""
    sp2_kinds = ("ketone", "imine", "sp2", "sp", "carbene")
    if len(reactive_atoms) != 2:
        return False
    i1, i2 = reactive_atoms.keys()
    if np.linalg.norm(coords[i1] - coords[i2]) >= 3.0:
        return False
    if not all(a.kind in sp2_kinds for a in reactive_atoms.values()):
        return False
    for path in nx.all_simple_paths(graph, i1, i2):
        if all(len(list(graph.neighbors(idx))) <= 3 for idx in path[1:-1]):
            return True
    return False


def is_vicinal(graph: nx.Graph, reactive_atoms: dict[int, ReactiveAtom]) -> bool:
    """Two bonded sp3/single-type reactive atoms (sigma* pair)
    (firecode/graph_manipulations.py:83-106)."""
    if len(reactive_atoms) != 2:
        return False
    i1, i2 = reactive_atoms.keys()
    if not all(a.kind in ("sp3", "single") for a in reactive_atoms.values()):
        return False
    return i2 in graph.neighbors(i1)


class Hypermolecule:
    """Conformer ensemble + graph + reactive-atom lobes + pivots."""

    def __init__(
        self,
        filename: str | Path | None = None,
        reactive_indices: Sequence[int] | None = None,
        charge: int | None = None,
        mult: int = 1,
        atomnos: np.ndarray | None = None,
        coords: np.ndarray | None = None,
        name: str = "molecule",
        logfunction: Callable[[str], None] | None = None,
    ) -> None:
        if filename is not None:
            ens = Ensemble.from_xyz(filename)
            self.filename = str(filename)
            self.basename = ens.basename
            self.atoms = ens.atoms
            self.atomnos = ens.atomnos
            coords_in = ens.coords
            name_charge = str(filename).count("+") - str(filename).count("-")
        else:
            assert atomnos is not None and coords is not None
            from firecode_tpu.pt import symbols_from_atomnos

            self.filename = name
            self.basename = name
            self.atomnos = np.asarray(atomnos, dtype=np.int32)
            self.atoms = symbols_from_atomnos(self.atomnos)
            coords_in = np.asarray(coords, dtype=np.float64)
            if coords_in.ndim == 2:
                coords_in = coords_in[None]
            name_charge = 0

        self.charge = charge if charge is not None else name_charge
        self.mult = mult
        self.logfunction = logfunction
        self.reactive_indices = np.array(
            [] if reactive_indices is None else list(reactive_indices), dtype=np.int64
        )

        self.centroid = coords_in.reshape(-1, 3).mean(axis=0)
        self.coords = coords_in - self.centroid
        self.graph = graphize(self.atomnos, self.coords[0])

        # embedding state (set by the embed algorithms)
        self.rotation = np.eye(3)
        self.position = np.zeros(3)

        # per-conformer reactive-atom dicts + pivots (set by compute_orbitals)
        self.reactive_atoms: dict[int, dict[int, ReactiveAtom]] = {}
        self.pivots: dict[int, list[Pivot]] = {}
        self.sigmatropic: dict[int, bool] = {}
        self.sp3_sigmastar = False
        self.constraints: list = []

    def __repr__(self) -> str:
        return f"Hypermolecule({self.basename}, {len(self.coords)} confs)"

    @property
    def n_atoms(self) -> int:
        return len(self.atomnos)

    def compute_orbitals(
        self, override: str | None = None, orb_dim: float | None = None
    ) -> None:
        """Build reactive-atom lobes for every conformer."""
        if len(self.reactive_indices) == 0:
            return
        # first pass (kinds only) to evaluate sigmatropic/vicinal flags
        first = {
            int(i): build_reactive_atom(
                self.graph, self.coords[0], int(i), self.reactive_indices, override=override
            )
            for i in self.reactive_indices
        }
        self.sp3_sigmastar = is_vicinal(self.graph, first)

        for c in range(len(self.coords)):
            atoms_c = {
                int(i): build_reactive_atom(
                    self.graph,
                    self.coords[c],
                    int(i),
                    self.reactive_indices,
                    override=override,
                )
                for i in self.reactive_indices
            }
            self.sigmatropic[c] = is_sigmatropic(self.graph, self.coords[c], atoms_c)
            # rebuild with flags applied
            self.reactive_atoms[c] = {
                int(i): build_reactive_atom(
                    self.graph,
                    self.coords[c],
                    int(i),
                    self.reactive_indices,
                    sigmatropic=self.sigmatropic[c],
                    sp3_sigmastar=self.sp3_sigmastar,
                    override=override,
                    orb_dim=orb_dim,
                )
                for i in self.reactive_indices
            }

    def set_orb_dim(self, index: int, orb_dim: float) -> None:
        """Impose a custom lobe length on one reactive atom (DIST keyword)."""
        for c in self.reactive_atoms:
            atom = self.reactive_atoms[c].get(index)
            if atom is not None:
                self.reactive_atoms[c][index] = atom.with_orb_dim(orb_dim)

    def scale_orbs(self, factor: float) -> None:
        """SHRINK keyword: scale every lobe length."""
        for c in self.reactive_atoms:
            for i, atom in self.reactive_atoms[c].items():
                self.reactive_atoms[c][i] = atom.with_orb_dim(atom.orb_dim * factor)

    def get_r_atoms(self, c: int) -> list[ReactiveAtom]:
        return list(self.reactive_atoms.get(c, {}).values())

    def get_orbital_length(self, index: int) -> float:
        from firecode_tpu.errors import NoOrbitalError

        atom = self.reactive_atoms.get(0, {}).get(index)
        if atom is None:
            raise NoOrbitalError(f"Index {index} is not a reactive index of {self.filename}")
        return atom.orb_dim

    def set_pivots(self, suprafacial: bool = False) -> None:
        """Build per-conformer pivots (firecode/embedder.py:904-989)."""
        for c in range(len(self.coords)):
            r_atoms = self.get_r_atoms(c)
            pivots: list[Pivot] = []
            if len(r_atoms) == 2:
                a1, a2 = r_atoms
                for i in range(a1.n_lobes):
                    for j in range(a2.n_lobes):
                        pivots.append(
                            Pivot(a1.centers[i], a2.centers[j], a1, a2, i, j)
                        )
            elif len(r_atoms) == 1:
                a1 = r_atoms[0]
                for i in range(a1.n_lobes):
                    for j in range(i + 1, a1.n_lobes):
                        pivots.append(Pivot(a1.centers[i], a1.centers[j], a1, a1, i, j))

            if suprafacial and len(pivots) == 4:
                # keep the two shortest pivots (the suprafacial pair)
                norms = np.array([p.norm for p in pivots])
                order = np.argsort(norms)
                pivots = [pivots[k] for k in sorted(order[:2])]

            if self.sp3_sigmastar and pivots:
                shortest = min(p.norm for p in pivots)
                pivots = [p for p in pivots if p.norm - shortest < 1e-5]

            self.pivots[c] = pivots

    def set_cumnums(self, offset: int) -> None:
        for c in self.reactive_atoms:
            for atom in self.reactive_atoms[c].values():
                atom.cumnum = atom.index + offset

    def write_hypermolecule(self, path: str | Path | None = None) -> None:
        """Write conformers + orbital lobe centers (X dummy atoms) to xyz."""
        path = path or f"{self.basename}_hypermolecule.xyz"
        lines = []
        for c in range(len(self.coords)):
            centers = np.concatenate(
                [a.centers for a in self.get_r_atoms(c)] or [np.zeros((0, 3))]
            )
            lines.append(str(self.n_atoms + len(centers)))
            lines.append(
                f"firecode_tpu hypermolecule {c} for {self.basename} "
                f"- reactive indices {self.reactive_indices.tolist()}"
            )
            for sym, (x, y, z) in zip(self.atoms, self.coords[c]):
                lines.append(f"{sym:<3s} {x:12.6f} {y:12.6f} {z:12.6f}")
            for x, y, z in centers:
                lines.append(f"X   {x:12.6f} {y:12.6f} {z:12.6f}")
        Path(path).write_text("\n".join(lines) + "\n")
