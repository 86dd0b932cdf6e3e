"""Native batched genetic torsion crossing — the "GC" half of iMTD-GC.

The reference reaches genetic structure crossing only through the CREST
binary (firecode/interfaces/crest.py:444 drives CREST, whose iMTD-GC
workflow interleaves metadynamics with genetic z-matrix crossing,
Pracht/Bohle/Grimme PCCP 2020). This module is a native, TPU-batched
equivalent working in torsion space:

    for every parent pair (i, j) in the pool, a child is generated on the
    reference (lowest-energy) structure by applying BOTH parents' torsion
    displacements at once:

        child_angles = ref_angles + wrap(angles_i - ref) + wrap(angles_j - ref)

    — CREST's z-matrix sum-of-differences restricted to the rotatable
    dihedrals, which is exactly the subspace the rest of this framework's
    conformer machinery (csearch, TFD pruning) operates in.

All children are generated in ONE jitted device program (a scan over the
torsions, vmapped over children — rotating about one bond changes only that
bond's dihedral, so absolute targets commute), clash-screened in one batched
call, optimized as one batched FIRE program, and merged into the pool with
the MOI+RMSD cascade. CREST runs this per-structure on CPU processes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from firecode_tpu.calculators.base import Calculator

_CLASH_THR = 1.2  # Angstrom: generated children closer than this are dropped


def pool_torsion_setup(atomnos: np.ndarray, coords: np.ndarray):
    """Host-side torsion discovery on the pool's connectivity.

    Returns (quads i32[T, 4], moving bool[T, N]) for the rotatable,
    non-redundant torsions (heavy-atom sides only are NOT filtered — methyl
    tops participate too, as in CREST).
    """
    from firecode_tpu.csearch import _torsion_masks
    from firecode_tpu.graphs import graphize
    from firecode_tpu.torsions import find_torsions

    graph = graphize(atomnos, coords)
    torsions = find_torsions(graph, atomnos, coords)
    if not torsions:
        return np.zeros((0, 4), np.int32), np.zeros((0, len(atomnos)), bool)
    quads, moving, _static = _torsion_masks(torsions, len(atomnos))
    return quads, moving


def _wrap(deg: jnp.ndarray) -> jnp.ndarray:
    """Wrap angles to (-180, 180]."""
    return deg - 360.0 * jnp.round(deg / 360.0)


@partial(jax.jit, static_argnames=("n_torsions",))
def _apply_targets(
    ref: jnp.ndarray,  # [N, 3] reference structure
    quads: jnp.ndarray,  # i32[T, 4]
    moving: jnp.ndarray,  # bool[T, N]
    ref_angles: jnp.ndarray,  # f[T] dihedrals measured on ref
    targets: jnp.ndarray,  # f[C, T] absolute target dihedrals per child
    n_torsions: int,
) -> jnp.ndarray:
    """Drive ref to each child's absolute torsion targets: [C, N, 3]."""
    from firecode_tpu.ops.torsion_ops import rotate_dihedral

    c = targets.shape[0]
    coords = jnp.broadcast_to(ref, (c, *ref.shape))
    deltas = _wrap(targets - ref_angles[None, :])  # [C, T]
    for t in range(n_torsions):
        coords = rotate_dihedral(coords, quads[t], deltas[:, t], moving[t])
    return coords


def cross_pool(
    pool_coords: np.ndarray,  # [P, N, 3], sorted by energy (ref = index 0)
    quads: np.ndarray,
    moving: np.ndarray,
    max_children: int = 256,
    min_turn: float = 30.0,
) -> np.ndarray:
    """Generate crossed children from every parent pair; clash-screened.

    min_turn: a parent contributes a torsion displacement only if it exceeds
    this many degrees — tiny thermal deviations would otherwise multiply
    into meaningless children. Children whose summed displacement is all
    below min_turn (duplicates of the reference) are dropped, as are
    children with any nonbonded contact under 1.2 A. Returns [C, N, 3]
    (possibly empty).
    """
    from firecode_tpu.ops.clash import pairwise_dist2
    from firecode_tpu.ops.torsion_ops import measure_dihedrals

    p, n = pool_coords.shape[0], pool_coords.shape[1]
    t = len(quads)
    if p < 2 or t == 0:
        return np.zeros((0, n, 3))

    pool_j = jnp.asarray(pool_coords)
    quads_j = jnp.asarray(quads)
    angles = np.asarray(measure_dihedrals(pool_j, quads_j))  # [P, T]
    ref_angles = angles[0]
    disp = np.asarray(_wrap(jnp.asarray(angles - ref_angles[None, :])))
    disp = np.where(np.abs(disp) >= min_turn, disp, 0.0)  # [P, T]

    ii, jj = np.triu_indices(p, k=1)
    targets = ref_angles[None, :] + disp[ii] + disp[jj]  # [C, T]
    # drop children identical to the reference (no surviving displacement)
    alive = np.any(np.abs(disp[ii]) + np.abs(disp[jj]) > 0.0, axis=1)
    targets = targets[alive]
    if len(targets) == 0:
        return np.zeros((0, n, 3))
    if len(targets) > max_children:
        targets = targets[:max_children]

    children = _apply_targets(
        jnp.asarray(pool_coords[0]),
        quads_j,
        jnp.asarray(moving),
        jnp.asarray(ref_angles),
        jnp.asarray(targets),
        t,
    )

    # clash screen: nonbonded pairs (graph distance >= 3 approximated by
    # "not within any torsion's 1-2/1-3 span" is overkill — bonded and
    # geminal pairs on the RIGID reference keep their ref distances, so any
    # NEW contact under the threshold comes from the rotation itself)
    d2 = pairwise_dist2(children)  # [C, N, N]
    d2_ref = pairwise_dist2(jnp.asarray(pool_coords[0]))
    near_ref = d2_ref < (_CLASH_THR * _CLASH_THR)  # bonded/geminal contacts
    clash = (d2 < _CLASH_THR * _CLASH_THR) & ~near_ref[None]
    ok = np.asarray(jnp.sum(clash, axis=(-2, -1)) == 0)
    return np.asarray(children, dtype=np.float64)[ok]


def run_gc(
    calc: Calculator,
    atomnos: np.ndarray,
    pool_coords: np.ndarray,
    pool_energies: np.ndarray,
    maxen: float = 6.0,
    rmsd_thr: float = 0.3,
    fmax: float = 0.05,
    opt_steps: int = 2000,
    max_children: int = 256,
    min_turn: float = 30.0,
    max_gens: int = 3,
    constraints=None,
    mesh=None,
) -> tuple[np.ndarray, np.ndarray, int]:
    """Genetic-crossing generations until the pool stops growing.

    Each generation crosses every parent pair, optimizes the children as one
    batched FIRE program, and merges them into the energy-windowed,
    cascade-deduplicated pool (CREST repeats GC until self-consistency;
    max_gens bounds it). mesh: optional "ens" mesh — the children's batched
    FIRE shards over it. Returns (coords, energies, n_new_total).
    """
    from firecode_tpu.md.goat import _dedup_pool
    from firecode_tpu.opt import optimize_batch

    atomnos = np.asarray(atomnos)
    pool_c = np.asarray(pool_coords, dtype=np.float64)
    pool_e = np.asarray(pool_energies, dtype=np.float64)
    quads, moving = pool_torsion_setup(atomnos, pool_c[0])

    n_new_total = 0
    for _gen in range(max_gens):
        children = cross_pool(
            pool_c, quads, moving, max_children=max_children, min_turn=min_turn
        )
        if len(children) == 0:
            break
        res = optimize_batch(
            calc, children, constraints=constraints, fmax=fmax,
            max_steps=opt_steps, mesh=mesh,
        )
        ok = np.asarray(res.converged)
        new_c = np.asarray(res.coords, dtype=np.float64)[ok]
        new_e = np.asarray(res.energy, dtype=np.float64)[ok]
        if len(new_c) == 0:
            break
        prev = len(pool_c)
        pool_c, pool_e, kept = _dedup_pool(
            np.concatenate([pool_c, new_c], axis=0),
            np.concatenate([pool_e, new_e], axis=0),
            atomnos, maxen, rmsd_thr,
        )
        # count surviving CHILDREN (index >= prev), not net pool growth —
        # dedup can merge previously-distinct parents (e.g. symmetry
        # homomers) while a genuinely new child enters
        grew = int(np.sum(kept >= prev))
        n_new_total += grew
        if grew == 0:
            break
    return pool_c, pool_e, n_new_total
