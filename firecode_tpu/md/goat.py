"""Native batched GOAT-style global conformer optimizer (goat_native>).

The reference reaches global optimization only through the proprietary ORCA
GOAT binary (firecode/interfaces/goat.py:32 — `! XTB2 GOAT`, %goat
MAXEN/GFNUPHILL blocks). This module is a native, TPU-batched equivalent of
GOAT's uphill/downhill cycle:

    round:  uphill  — W walkers run biased Langevin dynamics whose RMSD
                      Gaussian bias is PRE-SEEDED with the entire known
                      conformer pool (every walker is pushed out of every
                      basin found so far — GOAT's "GFNUPHILL" escape role),
            downhill— all deposited snapshots + walker endpoints are
                      optimized as ONE batched FIRE program,
            update  — merged pool is energy-windowed (MAXEN), sorted, and
                      deduplicated with the MOI+RMSD cascade,
    until the pool stops changing (patience rounds with no new conformer
    and no global-minimum improvement).

TPU-first: each uphill phase is one jitted program over all walkers
(md/metadynamics.py `_mtd_run` with a shared seeded history), each downhill
phase one batched optimizer call — the ORCA binary runs per-structure
processes. Pool size is traced (n_seed) at a fixed history capacity, so
every round reuses the same compiled uphill program.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from firecode_tpu.calculators.base import Calculator
from firecode_tpu.md.metadynamics import _FS, _mtd_run
from firecode_tpu.pt import MASSES


@dataclass
class GoatResult:
    coords: np.ndarray  # [P, N, 3] pool, sorted by energy
    energies: np.ndarray  # [P] kcal/mol (absolute, calculator scale)
    rounds: int  # uphill/downhill rounds actually run
    converged: bool  # True if the pool went stale before max_rounds


def _dedup_pool(coords, energies, atomnos, maxen, rmsd_thr):
    """Energy-window + sort + MOI/RMSD cascade; keeps lowest-energy first.

    Returns (coords, energies, kept) where kept holds the surviving
    structures' indices into the INPUT arrays (callers use it to tell
    which newly-appended candidates actually enlarged the pool)."""
    from firecode_tpu.prune import prune_by_moi, prune_by_rmsd

    idx = np.argsort(energies, kind="stable")
    coords, energies = coords[idx], energies[idx]
    win = energies <= energies[0] + maxen
    coords, energies, idx = coords[win], energies[win], idx[win]
    if len(coords) > 1:
        keep = np.asarray(prune_by_moi(coords, atomnos, energies=energies))
        coords, energies, idx = coords[keep], energies[keep], idx[keep]
    if len(coords) > 1:
        keep = np.asarray(
            prune_by_rmsd(coords, atomnos, rmsd_thr=rmsd_thr, energies=energies)
        )
        coords, energies, idx = coords[keep], energies[keep], idx[keep]
    return coords, energies, idx


def run_goat(
    calc: Calculator,
    atomnos: np.ndarray,
    coords: np.ndarray,
    n_walkers: int = 8,
    max_rounds: int = 6,
    uphill_steps: int = 1000,
    dep_every: int = 100,
    k_push: float = 4.0,
    alpha: float = 0.7,
    temperature: float = 700.0,
    maxen: float = 6.0,
    rmsd_thr: float = 0.3,
    fmax: float = 0.05,
    opt_steps: int = 2000,
    pool_cap: int = 64,
    patience: int = 2,
    min_tol: float = 0.05,
    dt_fs: float = 1.0,
    gamma_fs: float = 0.02,
    seed: int = 0,
    constraints=None,
    gc: bool = False,
    mesh=None,
) -> GoatResult:
    """GOAT-style global conformer search; returns the final pool.

    coords: one structure [N, 3] or an initial ensemble [B, N, 3]. maxen is
    the retained energy window in kcal/mol above the running global minimum
    (ORCA %goat MAXEN). pool_cap bounds the seeded bias history (lowest-
    energy pool members are seeded when the pool exceeds it). gc=True runs
    genetic torsion crossing (md/gc.py) on the final pool — the iMTD-GC
    composition the reference reaches only through the CREST binary.
    mesh: optional "ens" mesh — uphill walkers AND the downhill batched
    FIRE both shard over it (walkers are independent; zero collectives).
    """
    from firecode_tpu.opt import optimize_batch

    atomnos = np.asarray(atomnos)
    coords = np.asarray(coords, dtype=np.float64)
    if coords.ndim == 2:
        coords = coords[None]
    rng = np.random.default_rng(seed)

    def downhill(cands):
        res = optimize_batch(
            calc, cands, constraints=constraints, fmax=fmax,
            max_steps=opt_steps, mesh=mesh,
        )
        ok = np.asarray(res.converged)
        return (
            np.asarray(res.coords, dtype=np.float64)[ok],
            np.asarray(res.energy, dtype=np.float64)[ok],
        )

    # round 0: optimize + dedup the input ensemble
    pool_c, pool_e = downhill(coords)
    if len(pool_c) == 0:
        raise RuntimeError(
            "goat_native: no input structure optimized to convergence"
        )
    pool_c, pool_e, _ = _dedup_pool(pool_c, pool_e, atomnos, maxen, rmsd_thr)

    n = coords.shape[1]
    n_dep = uphill_steps // dep_every
    n_gauss = pool_cap + n_dep + 1
    masses = jnp.asarray(MASSES[atomnos])
    key = jax.random.PRNGKey(seed)

    stale = 0
    rounds_run = 0
    for r in range(max_rounds):
        rounds_run = r + 1
        p = min(len(pool_c), pool_cap)
        # walkers start from the pool (lowest-energy first, cycled) with a
        # small jitter so identical starts decorrelate under the thermostat
        starts = pool_c[np.arange(n_walkers) % len(pool_c)]
        starts = starts + 0.02 * rng.normal(size=starts.shape)
        hist0 = np.zeros((n_walkers, n_gauss, n, 3))
        hist0[:, :p] = pool_c[:p]
        starts_j, hist0_j = jnp.asarray(starts), jnp.asarray(hist0)
        if mesh is not None:
            from firecode_tpu.md.metadynamics import shard_walkers

            starts_j, hist0_j = shard_walkers(mesh, starts_j, hist0_j)
        key, sub = jax.random.split(key)
        x_end, hist, _ = _mtd_run(
            starts_j,
            masses,
            sub,
            jnp.asarray(float(temperature)),
            jnp.asarray(dt_fs * _FS),
            jnp.asarray(gamma_fs / _FS),
            jnp.asarray(float(k_push)),
            jnp.asarray(float(alpha)),
            calc,
            int(uphill_steps),
            int(dep_every),
            int(n_gauss),
            hist0=hist0_j,
            n_seed=jnp.asarray(p, jnp.int32),
        )
        # candidates: the walkers' own deposits (slots [p, p+n_dep)) plus
        # their endpoints; the seeded prefix is the already-known pool
        # (mesh-padded walkers, if any, are sliced off)
        deps = np.asarray(hist[:n_walkers, p : p + n_dep]).reshape(-1, n, 3)
        cands = np.concatenate([deps, np.asarray(x_end[:n_walkers])], axis=0)
        new_c, new_e = downhill(cands)

        prev_len, prev_min = len(pool_c), pool_e[0]
        pool_c = np.concatenate([pool_c, new_c], axis=0)
        pool_e = np.concatenate([pool_e, new_e], axis=0)
        pool_c, pool_e, kept = _dedup_pool(
            pool_c, pool_e, atomnos, maxen, rmsd_thr
        )

        improved = pool_e[0] < prev_min - min_tol
        # "grew" = some walker candidate survived dedup (net size can stay
        # flat when dedup also merges previously-distinct pool members)
        grew = bool(np.any(kept >= prev_len))
        stale = 0 if (improved or grew) else stale + 1
        if stale >= patience:
            return _finish(
                pool_c, pool_e, rounds_run, True, gc, calc, atomnos,
                maxen, rmsd_thr, fmax, opt_steps, constraints, mesh,
            )

    return _finish(
        pool_c, pool_e, rounds_run, False, gc, calc, atomnos,
        maxen, rmsd_thr, fmax, opt_steps, constraints, mesh,
    )


def _finish(
    pool_c, pool_e, rounds_run, converged, gc, calc, atomnos,
    maxen, rmsd_thr, fmax, opt_steps, constraints, mesh=None,
) -> GoatResult:
    """Optional final genetic-crossing pass (iMTD-GC's GC stage)."""
    if gc and len(pool_c) >= 2:
        from firecode_tpu.md.gc import run_gc

        pool_c, pool_e, _ = run_gc(
            calc, atomnos, pool_c, pool_e, maxen=maxen, rmsd_thr=rmsd_thr,
            fmax=fmax, opt_steps=opt_steps, constraints=constraints,
            mesh=mesh,
        )
    return GoatResult(pool_c, pool_e, rounds_run, converged)
