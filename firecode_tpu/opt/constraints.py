"""Constraints as differentiable energy penalties.

The reference implements constraints as hand-written force modifications on
ASE Atoms (Spring/HalfSpring/PlanarAngleSpring/DihedralSpring,
firecode/ase_manipulations.py:92-396). Here each constraint is an energy
term; forces come from autodiff, so constrained optimization is just the
calculator plus a penalty — and it batches/shards like everything else.

All constraint sets are padded arrays (k = 0 rows are inert), so one compiled
optimizer serves any number of constraints.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

import jax.numpy as jnp
import numpy as np

from firecode_tpu.ops.algebra import dihedral

DEFAULT_SPRING_K = 250.0  # kcal/mol/A^2
DEFAULT_ANGLE_K = 100.0  # kcal/mol/rad^2-like
DEFAULT_DIHEDRAL_K = 50.0  # kcal/mol


def new_bond_preventer(atomnos, graph, k: float = 100.0, factor: float = 1.1):
    """Penalty energy keeping currently-nonbonded pairs from forming bonds.

    Reference NewBondPreventer (firecode/ase_manipulations.py:342): a
    repulsive half-spring activates when a nonbonded pair gets closer than
    factor * (r_i + r_j). Returns a pure energy fn to compose onto a
    calculator via Calculator.with_extra.
    """
    import networkx as nx
    import numpy as np

    from firecode_tpu.pt import COVALENT_RADII

    atomnos = np.asarray(atomnos)
    n = len(atomnos)
    radii = COVALENT_RADII[atomnos]
    cutoff = factor * (radii[:, None] + radii[None, :])
    nonbonded = ~np.eye(n, dtype=bool)
    for i, j in graph.edges:
        nonbonded[i, j] = nonbonded[j, i] = False
    # 1-3 pairs are held by angle terms, leave them out too
    for path in nx.all_pairs_shortest_path_length(graph, cutoff=2):
        i, dists = path
        for j, d in dists.items():
            if d == 2:
                nonbonded[i, j] = nonbonded[j, i] = False
    cutoff_j = jnp.asarray(np.where(nonbonded, cutoff, 0.0))

    def energy(coords: jnp.ndarray) -> jnp.ndarray:
        diff = coords[:, None, :] - coords[None, :, :]
        d = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
        under = jnp.maximum(cutoff_j.astype(coords.dtype) - d, 0.0)
        return 0.5 * 0.5 * k * jnp.sum(under * under)  # halve: symmetric sum

    return energy


@dataclass
class Constraints:
    """Padded constraint tables; build with the `add_*` helpers then `freeze`."""

    dist_idx: list = field(default_factory=list)  # (i, j, d_eq, k)
    halfdist_idx: list = field(default_factory=list)  # (i, j, d_max, k)
    angle_idx: list = field(default_factory=list)  # (i, c, j, theta_eq_deg, k)
    dihedral_idx: list = field(default_factory=list)  # (i1..i4, phi_eq_deg, k)
    frozen: set = field(default_factory=set)

    def add_distance(self, i: int, j: int, d_eq: float, k: float = DEFAULT_SPRING_K):
        self.dist_idx.append((i, j, d_eq, k))
        return self

    def add_max_distance(self, i: int, j: int, d_max: float, k: float = DEFAULT_SPRING_K):
        self.halfdist_idx.append((i, j, d_max, k))
        return self

    def add_angle(self, i: int, c: int, j: int, theta_deg: float, k: float = DEFAULT_ANGLE_K):
        self.angle_idx.append((i, c, j, theta_deg, k))
        return self

    def add_dihedral(self, quad: Sequence[int], phi_deg: float, k: float = DEFAULT_DIHEDRAL_K):
        self.dihedral_idx.append((*quad, phi_deg, k))
        return self

    def freeze_atoms(self, indices: Sequence[int]):
        self.frozen.update(int(i) for i in indices)
        return self

    def signature(self) -> tuple:
        """Hashable content key (used to cache composed calculators by value,
        not by object id — ids can be recycled after GC)."""
        return (
            tuple(tuple(r) for r in self.dist_idx),
            tuple(tuple(r) for r in self.halfdist_idx),
            tuple(tuple(r) for r in self.angle_idx),
            tuple(tuple(r) for r in self.dihedral_idx),
            tuple(sorted(self.frozen)),
        )

    @property
    def constrained_atoms(self) -> set[int]:
        out = set()
        for row in self.dist_idx:
            out.update(row[:2])
        for row in self.halfdist_idx:
            out.update(row[:2])
        for row in self.angle_idx:
            out.update(row[:3])
        for row in self.dihedral_idx:
            out.update(row[:4])
        return {int(i) for i in out}

    def energy_fn(self):
        """Pure penalty energy of one structure coords[N, 3] (jnp scalar)."""
        d_i = np.array([r[:2] for r in self.dist_idx], dtype=np.int32).reshape(-1, 2)
        d_eq = np.array([r[2] for r in self.dist_idx])
        d_k = np.array([r[3] for r in self.dist_idx])
        h_i = np.array([r[:2] for r in self.halfdist_idx], dtype=np.int32).reshape(-1, 2)
        h_max = np.array([r[2] for r in self.halfdist_idx])
        h_k = np.array([r[3] for r in self.halfdist_idx])
        a_i = np.array([r[:3] for r in self.angle_idx], dtype=np.int32).reshape(-1, 3)
        a_cos0 = np.cos(np.radians([r[3] for r in self.angle_idx]))
        a_k = np.array([r[4] for r in self.angle_idx])
        t_i = np.array([r[:4] for r in self.dihedral_idx], dtype=np.int32).reshape(-1, 4)
        t_phi0 = np.radians([r[4] for r in self.dihedral_idx])
        t_k = np.array([r[5] for r in self.dihedral_idx])

        def energy(coords: jnp.ndarray) -> jnp.ndarray:
            e = jnp.asarray(0.0, dtype=coords.dtype)
            if len(d_k):
                d = jnp.linalg.norm(coords[d_i[:, 0]] - coords[d_i[:, 1]], axis=-1)
                e = e + jnp.sum(0.5 * jnp.asarray(d_k) * (d - jnp.asarray(d_eq)) ** 2)
            if len(h_k):
                d = jnp.linalg.norm(coords[h_i[:, 0]] - coords[h_i[:, 1]], axis=-1)
                over = jnp.maximum(d - jnp.asarray(h_max), 0.0)
                e = e + jnp.sum(0.5 * jnp.asarray(h_k) * over**2)
            if len(a_k):
                v1 = coords[a_i[:, 0]] - coords[a_i[:, 1]]
                v2 = coords[a_i[:, 2]] - coords[a_i[:, 1]]
                cos = jnp.sum(v1 * v2, axis=-1) / jnp.sqrt(
                    jnp.sum(v1 * v1, -1) * jnp.sum(v2 * v2, -1) + 1e-12
                )
                e = e + jnp.sum(jnp.asarray(a_k) * (cos - jnp.asarray(a_cos0)) ** 2)
            if len(t_k):
                phi = jnp.radians(dihedral(coords[t_i]))
                e = e + jnp.sum(jnp.asarray(t_k) * (1.0 - jnp.cos(phi - jnp.asarray(t_phi0))))
            return e

        return energy

    def move_mask(self, n_atoms: int) -> np.ndarray:
        """bool[N]: True where atoms are free to move."""
        mask = np.ones(n_atoms, dtype=bool)
        for i in self.frozen:
            mask[i] = False
        return mask

    def deviations(self, coords: jnp.ndarray) -> jnp.ndarray:
        """Per-distance-constraint |d - d_eq| for fitness checks
        (firecode/optimization_methods.py:160-177)."""
        if not self.dist_idx:
            return jnp.zeros(coords.shape[:-2] + (0,))
        d_i = np.array([r[:2] for r in self.dist_idx], dtype=np.int32)
        d_eq = jnp.asarray(np.array([r[2] for r in self.dist_idx]))
        d = jnp.linalg.norm(
            coords[..., d_i[:, 0], :] - coords[..., d_i[:, 1], :], axis=-1
        )
        return jnp.abs(d - d_eq)


def per_lane_restraint_calc(calc, kind: str, indices, targets, k: float = 150.0):
    """Calculator whose lane b restrains `indices` toward targets[b].

    Batches relaxed scans into ONE device program: every lane of a
    [B, N, 3] batch relaxes under its OWN restraint target (e.g. all fine
    re-scan points of an atropisomer peak at once) — the reference, and the
    plain Constraints object, hold one scalar target per program.

    kind: "dihedral" (indices = quadruplet, targets in degrees; periodic
    1 - cos(phi - phi0) well like Constraints.add_dihedral) or "distance"
    (indices = pair, targets in Angstrom; harmonic).
    """
    import jax

    from firecode_tpu.calculators.base import BatchedCalculator
    from firecode_tpu.ops.algebra import dihedral as _dih

    idx = np.asarray(indices, dtype=np.int32)
    tgt = jnp.asarray(np.asarray(targets, dtype=np.float64))

    if kind == "dihedral":
        phi0 = jnp.radians(tgt)

        def e_one(coords, phi0_b):
            phi = jnp.radians(_dih(coords[idx][None])[0])
            return calc.energy_one(coords) + k * (1.0 - jnp.cos(phi - phi0_b))

        lane_tgt = phi0
    elif kind == "distance":

        def e_one(coords, d0_b):
            d = jnp.linalg.norm(coords[idx[0]] - coords[idx[1]])
            return calc.energy_one(coords) + 0.5 * k * (d - d0_b) ** 2

        lane_tgt = tgt
    else:
        raise ValueError(f"unknown per-lane restraint kind {kind!r}")

    class _PerLane(BatchedCalculator):
        def __init__(self):
            super().__init__(name=f"{calc.name}+{kind}-scan")

        def energy(self, coords):
            return jax.vmap(e_one)(jnp.asarray(coords), lane_tgt)

        def energy_and_forces(self, coords):
            e, g = jax.vmap(jax.value_and_grad(e_one))(
                jnp.asarray(coords), lane_tgt
            )
            return e, -g

    return _PerLane()
