"""Pure-numpy reference implementations of the similarity-pruning cascade.

This module is the framework's CPU oracle: slow, obviously-correct, float64
implementations that define the semantics the device kernels in
`firecode_tpu.prune.cascade` must reproduce exactly (keep-list identical).
They also document the pruning contract replacing prism_pruner's
prune_by_rmsd / prune_by_rmsd_rot_corr / prune_by_moment_of_inertia
(SURVEY.md section 2.2):

- structures are visited in array order; a structure is discarded iff it is
  "similar" to an earlier structure that was KEPT (greedy keep-first);
- when energies are given, pairs further apart than max_dE kcal/mol are never
  considered similar (energy gating);
- RMSD similarity means min-RMSD < thr AND max single-atom deviation < 2*thr
  (double criterion, firecode/utils.py:587-597);
- MOI similarity means all three principal moments agree within a relative
  tolerance;
- TFD similarity means the wrapped L1 torsion-fingerprint distance < thresh
  degrees (firecode/torsion_module.py:1056-1067).
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from firecode_tpu.pt import MASSES

MOI_REL_TOL = 0.01


def np_kabsch(ref: np.ndarray, tgt: np.ndarray) -> np.ndarray:
    """Rotation R with R @ tgt_n ~ ref_n for centered inputs (SVD Kabsch)."""
    h = tgt.T @ ref  # (3,3)
    u, s, vt = np.linalg.svd(h)
    d = np.sign(np.linalg.det(vt.T @ u.T))
    flip = np.diag([1.0, 1.0, d])
    return vt.T @ flip @ u.T


def np_rmsd_and_max(ref: np.ndarray, tgt: np.ndarray) -> tuple[float, float]:
    """Minimum RMSD + max atomic deviation after optimal superposition."""
    a = ref - ref.mean(axis=0)
    b = tgt - tgt.mean(axis=0)
    r = np_kabsch(a, b)
    b_rot = b @ r.T
    dev = np.linalg.norm(b_rot - a, axis=1)
    rmsd = float(np.sqrt(np.mean(dev**2)))
    return rmsd, float(dev.max())


def np_greedy_keep(similar: Callable[[int, int], bool], n: int) -> np.ndarray:
    """Greedy keep-first scan; similar(i, j) for kept i < j."""
    keep = np.ones(n, dtype=bool)
    for i in range(n):
        if not keep[i]:
            continue
        for j in range(i + 1, n):
            if keep[j] and similar(i, j):
                keep[j] = False
    return keep


def _energy_gate(energies: np.ndarray | None, max_dE: float) -> Callable[[int, int], bool]:
    if energies is None:
        return lambda i, j: True
    return lambda i, j: abs(energies[i] - energies[j]) < max_dE


def np_prune_by_rmsd(
    coords: np.ndarray,
    rmsd_thr: float = 0.5,
    energies: np.ndarray | None = None,
    max_dE: float = 1.0,
) -> np.ndarray:
    gate = _energy_gate(energies, max_dE)

    def similar(i: int, j: int) -> bool:
        if not gate(i, j):
            return False
        rmsd, maxdev = np_rmsd_and_max(coords[i], coords[j])
        return rmsd < rmsd_thr and maxdev < 2 * rmsd_thr

    return np_greedy_keep(similar, len(coords))


def np_prune_by_rmsd_rot_corr(
    coords: np.ndarray,
    permutations: np.ndarray,
    rmsd_thr: float = 0.5,
    energies: np.ndarray | None = None,
    max_dE: float = 1.0,
) -> np.ndarray:
    """permutations: i32[P, N] atom-index maps (identity NOT included)."""
    gate = _energy_gate(energies, max_dE)

    def similar(i: int, j: int) -> bool:
        if not gate(i, j):
            return False
        rmsd, maxdev = np_rmsd_and_max(coords[i], coords[j])
        if rmsd < rmsd_thr and maxdev < 2 * rmsd_thr:
            return True
        for perm in permutations:
            rmsd, maxdev = np_rmsd_and_max(coords[i], coords[j][perm])
            if rmsd < rmsd_thr and maxdev < 2 * rmsd_thr:
                return True
        return False

    return np_greedy_keep(similar, len(coords))


def np_inertia_moments(coords: np.ndarray, atomnos: np.ndarray) -> np.ndarray:
    m = MASSES[atomnos]
    com = (coords * m[:, None]).sum(axis=0) / m.sum()
    r = coords - com
    r2 = np.sum(r * r, axis=1)
    tensor = np.einsum("n,nab->ab", m, r2[:, None, None] * np.eye(3) - r[:, :, None] * r[:, None, :])
    return np.sort(np.linalg.eigvalsh(tensor))


def np_prune_by_moi(
    coords: np.ndarray,
    atomnos: np.ndarray,
    rel_tol: float = MOI_REL_TOL,
    energies: np.ndarray | None = None,
    max_dE: float = 1.0,
) -> np.ndarray:
    moments = np.stack([np_inertia_moments(c, atomnos) for c in coords])
    gate = _energy_gate(energies, max_dE)

    log_m = np.log(np.maximum(moments, 1e-30))

    def similar(i: int, j: int) -> bool:
        if not gate(i, j):
            return False
        # symmetric log-space ratio test (mirrors cascade._make_moi_sim)
        return bool(np.max(np.abs(log_m[i] - log_m[j])) < -np.log1p(-rel_tol))

    return np_greedy_keep(similar, len(coords))


def np_dihedral(p: np.ndarray) -> float:
    b0 = p[0] - p[1]
    b1 = p[2] - p[1]
    b2 = p[3] - p[2]
    b1n = b1 / np.linalg.norm(b1)
    v = b0 - (b0 @ b1n) * b1n
    w = b2 - (b2 @ b1n) * b1n
    x = v @ w
    y = np.cross(b1n, v) @ w
    return float(np.degrees(np.arctan2(y, x)))


def np_torsion_fingerprints(coords: np.ndarray, quadruplets: np.ndarray) -> np.ndarray:
    out = np.empty((len(coords), len(quadruplets)))
    for b, frame in enumerate(coords):
        for t, q in enumerate(quadruplets):
            out[b, t] = np_dihedral(frame[q])
    return out


def np_prune_by_tfd(
    coords: np.ndarray,
    quadruplets: np.ndarray,
    thresh: float = 10.0,
    energies: np.ndarray | None = None,
    max_dE: float = 1.0,
) -> np.ndarray:
    tf = np_torsion_fingerprints(coords, quadruplets)
    gate = _energy_gate(energies, max_dE)

    def similar(i: int, j: int) -> bool:
        if not gate(i, j):
            return False
        delta = np.abs(tf[i] - tf[j])
        delta = np.abs(delta - (delta > 180.0) * 360.0)
        return bool(delta.sum() < thresh)

    return np_greedy_keep(similar, len(coords))
