"""Device-side similarity-pruning cascade (the north-star component).

Greedy keep-first pruning is inherently order-dependent, so the kernel walks
the ensemble in fixed-size blocks:

  for each row block b (in order):
      dead  = any(kept earlier-block structure similar to row)   # parallel,
              accumulated over previous blocks on the MXU        # big matmuls
      keep  = sequential greedy resolution WITHIN the block      # K tiny steps
              using the block's own similarity matrix

This reproduces the exact sequential semantics of the numpy oracle
(firecode_tpu/prune/oracle.py) — verified keep-list-identical in tests —
while >99% of the FLOPs live in the all-pairs QCP correlation matmuls
(firecode_tpu/ops/rmsd.py). Similarity matrices are never materialized beyond
one (block x block) tile, so memory stays O(B*N + K^2) for any ensemble size.

Replaces prism_pruner.prune_by_rmsd / prune_by_rmsd_rot_corr /
prune_by_moment_of_inertia and firecode/torsion_module.py:957-1076 (TFD).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from firecode_tpu.ops.rmsd import (
    _pairwise_correlation,
    _qcp_lambda_max,
    _rmsd_from_lambda,
    center_coords,
    qcp_rotation,
)
from firecode_tpu.ops.torsion_ops import torsion_fingerprints
from firecode_tpu.pt import MASSES

DEFAULT_BLOCK = 256
_MAXDEV_ATOM_CHUNK = 16

SimFn = Callable[..., jnp.ndarray]


# --------------------------------------------------------------------------
# generic blockwise greedy engine
# --------------------------------------------------------------------------


def _resolve_block_greedy(sim_in: jnp.ndarray, init: jnp.ndarray) -> jnp.ndarray:
    """Exact within-block greedy keep-first from the block similarity matrix.

    The recurrence keep[i] = init[i] & ~any_{j<i}(sim[j,i] & keep[j]) has a
    strictly lower-triangular (acyclic) dependency, so its fixpoint is unique
    and Jacobi sweeps converge to the sequential answer in at most
    depth(dependency chain) iterations — a handful of [K, K] boolean ops
    instead of K sequential steps.
    """
    k = init.shape[0]
    strictly_before = jnp.triu(jnp.ones((k, k), dtype=bool), k=1)  # [j, i] with j < i

    def body(carry):
        keep, _ = carry
        kill = jnp.any(sim_in & keep[:, None] & strictly_before, axis=0)
        new = init & ~kill
        return new, jnp.any(new != keep)

    def cond(carry):
        _, changed = carry
        return changed

    keep, _ = lax.while_loop(cond, body, (init, jnp.asarray(True)))
    return keep


def _blockwise_greedy(
    feats: dict,
    valid: jnp.ndarray,
    sim_fn: SimFn,
    block: int,
    full_column: bool = False,
) -> jnp.ndarray:
    """Exact greedy keep-first over Bp structures; Bp % block == 0.

    feats: dict of arrays with leading dim Bp. sim_fn(row_feats, col_feats)
    -> bool[K, L] with [i, j] = "i and j are similar".

    full_column=True computes each row-block's similarity against the WHOLE
    ensemble in one kernel (better for cheap feature spaces: MOI/TFD);
    full_column=False loops over column blocks (bounds memory for the heavy
    coordinate-based RMSD similarity).
    """
    bp = valid.shape[0]
    nblocks = bp // block
    global_idx = jnp.arange(bp)

    def get_block(b):
        return {
            k: lax.dynamic_slice_in_dim(v, b * block, block, axis=0) for k, v in feats.items()
        }

    def outer(b, keep):
        row = get_block(b)

        if full_column:
            sim_all = sim_fn(feats, row)  # [Bp, K]
            earlier = (global_idx < b * block)[:, None]
            dead = jnp.any(sim_all & keep[:, None] & earlier, axis=0)
        else:

            def col_body(p, dead):
                col = get_block(p)
                col_keep = lax.dynamic_slice_in_dim(keep, p * block, block)
                sim = sim_fn(col, row)  # [K_col, K_row]
                return dead | jnp.any(sim & col_keep[:, None], axis=0)

            dead = lax.fori_loop(0, b, col_body, jnp.zeros(block, dtype=bool))

        sim_in = sim_fn(row, row)
        init = lax.dynamic_slice_in_dim(valid, b * block, block) & ~dead
        kb = _resolve_block_greedy(sim_in, init)
        return lax.dynamic_update_slice_in_dim(keep, kb, b * block, axis=0)

    return lax.fori_loop(0, nblocks, outer, jnp.zeros(bp, dtype=bool))


def _pad_block(arrays: dict, b: int, block: int) -> tuple[dict, jnp.ndarray, int]:
    bp = max(block, -(-b // block) * block)
    pad = bp - b
    padded = {
        k: jnp.pad(v, [(0, pad)] + [(0, 0)] * (v.ndim - 1)) for k, v in arrays.items()
    }
    valid = jnp.arange(bp) < b
    return padded, valid, bp


def _energy_sim(row: dict, col: dict, sim: jnp.ndarray, max_dE) -> jnp.ndarray:
    if "energies" in row:
        de = jnp.abs(row["energies"][:, None] - col["energies"][None, :])
        sim = sim & (de < max_dE)
    return sim


# --------------------------------------------------------------------------
# RMSD similarity
# --------------------------------------------------------------------------


def _maxdev_from_rotation(
    ac: jnp.ndarray, bc: jnp.ndarray, rot: jnp.ndarray
) -> jnp.ndarray:
    """Max per-atom deviation for all pairs: dev_n^2 = |a_n|^2 + |b_n|^2 -
    2 a_n^T R b_n, expanded as 9 broadcast FMAs per atom chunk (tiny batched
    3x3 matvecs lower terribly on the MXU; this stays pure VPU)."""
    n = ac.shape[1]
    k, l = ac.shape[0], bc.shape[0]
    maxdev2 = jnp.zeros((k, l), dtype=ac.dtype)
    for start in range(0, n, _MAXDEV_ATOM_CHUNK):
        stop = min(start + _MAXDEV_ATOM_CHUNK, n)
        an = ac[:, start:stop, :]  # [K, c, 3]
        bn = bc[:, start:stop, :]  # [L, c, 3]
        p = jnp.zeros((k, l, stop - start), dtype=ac.dtype)
        for x in range(3):
            for y in range(3):
                p = p + rot[:, :, x, y, None] * (
                    an[:, None, :, x] * bn[None, :, :, y]
                )
        a2 = jnp.sum(an * an, axis=-1)[:, None, :]
        b2 = jnp.sum(bn * bn, axis=-1)[None, :, :]
        dev2 = a2 + b2 - 2.0 * p
        maxdev2 = jnp.maximum(maxdev2, jnp.max(dev2, axis=-1))
    return jnp.sqrt(jnp.maximum(maxdev2, 0.0))


def _rmsd_maxdev_block(
    ac: jnp.ndarray,
    ga: jnp.ndarray,
    bc: jnp.ndarray,
    gb: jnp.ndarray,
    wsum,
    use_maxdev: bool,
    thr=None,
    use_pallas: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray | None]:
    if use_pallas and use_maxdev:
        # fused VMEM tile emitting rmsd AND the optimal-rotation quaternion:
        # the (K, L, 3, 3) correlation tensor never reaches HBM and the
        # max-deviation recovery below needs no recompute (VERDICT r2 #5)
        from firecode_tpu.ops.algebra import quaternion_to_matrix
        from firecode_tpu.ops.pallas_qcp import pallas_rmsd_quat_tile

        rmsd, quat = pallas_rmsd_quat_tile(ac, ga, bc, gb, wsum, thr=thr)

        def compute_q(_):
            rot = jnp.swapaxes(quaternion_to_matrix(quat), -1, -2)
            return _maxdev_from_rotation(ac, bc, rot)

        if thr is not None:
            any_close = jnp.any(rmsd < thr)
            maxdev = lax.cond(
                any_close, compute_q, lambda _: jnp.zeros_like(rmsd), operand=None
            )
        else:
            maxdev = compute_q(None)
        return rmsd, maxdev
    if use_pallas:
        # rmsd-only: the single-output tile kernel
        from firecode_tpu.ops.pallas_qcp import pallas_rmsd_tile

        return pallas_rmsd_tile(ac, ga, bc, gb, wsum), None
    s = _pairwise_correlation(ac, bc)
    lam = _qcp_lambda_max(s, ga[:, None], gb[None, :])
    rmsd = _rmsd_from_lambda(ga[:, None], gb[None, :], lam, wsum)
    if not use_maxdev:
        return rmsd, None

    def compute(_):
        rot = qcp_rotation(s, lam)  # [K, L, 3, 3]
        return _maxdev_from_rotation(ac, bc, rot)

    if thr is not None:
        # the deviation criterion only matters for rmsd-close pairs: skip the
        # whole rotation recovery when this tile has none
        any_close = jnp.any(rmsd < thr)
        maxdev = lax.cond(
            any_close, compute, lambda _: jnp.zeros_like(rmsd), operand=None
        )
    else:
        maxdev = compute(None)
    return rmsd, maxdev


def _make_rmsd_sim(thr, max_dE, use_maxdev: bool, wsum, use_pallas: bool = False) -> SimFn:
    def sim_fn(row: dict, col: dict) -> jnp.ndarray:
        rmsd, maxdev = _rmsd_maxdev_block(
            row["c"], row["g"], col["c"], col["g"], wsum, use_maxdev, thr=thr,
            use_pallas=use_pallas,
        )
        sim = rmsd < thr
        if maxdev is not None:
            sim = sim & (maxdev < 2.0 * thr)
        return _energy_sim(row, col, sim, max_dE)

    return sim_fn


@partial(
    jax.jit,
    static_argnames=("use_maxdev", "block", "has_energies", "has_mask", "use_pallas"),
)
def _prune_rmsd_device(
    coords: jnp.ndarray,
    energies: jnp.ndarray,
    atom_mask: jnp.ndarray,
    thr: jnp.ndarray,
    max_dE: jnp.ndarray,
    use_maxdev: bool,
    block: int,
    has_energies: bool,
    has_mask: bool,
    use_pallas: bool = False,
) -> jnp.ndarray:
    b = coords.shape[0]
    weights = atom_mask.astype(coords.dtype) if has_mask else None
    centered, g, wsum = center_coords(coords, weights)
    # center_coords prescales by sqrt(w); for 0/1 masks this zeroes padded
    # atoms (they contribute nothing to RMSD or max-deviation) and leaves
    # real atoms untouched, so the downstream kernels need no changes
    feats = {"c": centered, "g": g}
    if has_energies:
        feats["energies"] = energies
    feats, valid, _ = _pad_block(feats, b, block)
    sim_fn = _make_rmsd_sim(thr, max_dE, use_maxdev, wsum, use_pallas=use_pallas)
    return _blockwise_greedy(feats, valid, sim_fn, block)[:b]


def pallas_default(use_maxdev: bool = False) -> bool:
    """Production default for the fused Pallas RMSD tiles.

    On for all RMSD screens on real TPU backends. rmsd-only uses the
    single-output tile kernel (measured 3.2x over the jnp path at 8192^2
    pairs — the correlation tensor never leaves VMEM); the max-deviation
    criterion uses the quaternion-emitting kernel, so rotation recovery for
    close tiles needs no correlation recompute. Off outside TPU (interpret
    mode is far slower than jnp). Override with FIRECODE_TPU_PALLAS=1/0."""
    import os

    env = os.environ.get("FIRECODE_TPU_PALLAS")
    if env is not None:
        return env.strip().lower() not in ("0", "false", "off", "")
    return jax.default_backend() == "tpu"


def prune_by_rmsd(
    coords,
    atomnos=None,
    rmsd_thr: float = 0.5,
    energies=None,
    max_dE: float = 1.0,
    use_maxdev: bool = True,
    block: int = DEFAULT_BLOCK,
    atom_mask=None,
    mesh=None,
    use_pallas: bool | None = None,
    as_numpy: bool = True,
) -> np.ndarray:
    """Greedy RMSD-similarity keep mask for an ensemble [B, N, 3].

    as_numpy=False returns the keep mask as a DEVICE array — at the 1e7
    point the host round trip of a 10 MB bool mask costs ~1 s through a
    tunneled backend, and callers that compact on device ship it back.

    atom_mask: optional bool[N] — False lanes are padding (bucketed
    variable-size molecules) and are excluded from RMSD and max-deviation.
    mesh: optional multi-device "ens" mesh — the column reductions are then
    distributed over it (keep-lists stay bit-identical).
    """
    coords = jnp.asarray(coords)
    b = coords.shape[0]
    if b <= 1:
        return np.ones(b, dtype=bool)
    if mesh is not None and mesh.devices.size > 1:
        from firecode_tpu.parallel.sharded_prune import prune_by_rmsd_sharded

        return prune_by_rmsd_sharded(
            coords, rmsd_thr, energies, max_dE, _shard_block(block, b, mesh), mesh,
            use_maxdev, atom_mask,
        )
    block = min(block, _pow2_at_most(b))
    has_energies = energies is not None
    if has_energies and int(np.shape(energies)[0]) != b:
        raise ValueError(
            f"energies length {np.shape(energies)[0]} does not match ensemble size {b}"
        )
    has_mask = atom_mask is not None
    # device-side zeros when no energies: jnp.asarray(np.zeros(1e7)) ships
    # 40 MB of host zeros through the ~20 MB/s TPU tunnel (~2 s measured
    # at the 10M bench point)
    e = (
        jnp.asarray(energies, dtype=coords.dtype)
        if has_energies
        else jnp.zeros(b, dtype=coords.dtype)
    )
    mask = jnp.asarray(
        atom_mask if has_mask else np.ones(coords.shape[1], dtype=bool)
    )
    keep = _prune_rmsd_device(
        coords,
        e,
        mask,
        jnp.asarray(rmsd_thr, coords.dtype),
        jnp.asarray(max_dE, coords.dtype),
        use_maxdev,
        block,
        has_energies,
        has_mask,
        pallas_default(use_maxdev) if use_pallas is None else use_pallas,
    )
    return np.asarray(keep) if as_numpy else keep


# --------------------------------------------------------------------------
# rotamer-corrected RMSD similarity
# --------------------------------------------------------------------------


def _make_rmsd_rot_corr_sim(
    thr, max_dE, use_maxdev: bool, wsum, perms: jnp.ndarray, use_pallas: bool = False
) -> SimFn:
    def sim_fn(row: dict, col: dict) -> jnp.ndarray:
        rmsd, maxdev = _rmsd_maxdev_block(
            row["c"], row["g"], col["c"], col["g"], wsum, use_maxdev, thr=thr,
            use_pallas=use_pallas,
        )
        sim = rmsd < thr
        if maxdev is not None:
            sim = sim & (maxdev < 2.0 * thr)
        for p in range(perms.shape[0]):
            # permuting centered coords is valid: centroids are perm-invariant
            bp = col["c"][:, perms[p], :]
            rmsd_p, maxdev_p = _rmsd_maxdev_block(
                row["c"], row["g"], bp, col["g"], wsum, use_maxdev, thr=thr,
                use_pallas=use_pallas,
            )
            sim_p = rmsd_p < thr
            if maxdev_p is not None:
                sim_p = sim_p & (maxdev_p < 2.0 * thr)
            sim = sim | sim_p
        return _energy_sim(row, col, sim, max_dE)

    return sim_fn


@partial(
    jax.jit,
    static_argnames=("use_maxdev", "block", "has_energies", "use_pallas", "has_mask"),
)
def _prune_rmsd_rot_corr_device(
    coords, energies, perms, thr, max_dE, use_maxdev: bool, block: int,
    has_energies: bool, use_pallas: bool = False, atom_mask=None,
    has_mask: bool = False,
) -> jnp.ndarray:
    b = coords.shape[0]
    weights = atom_mask.astype(coords.dtype) if has_mask else None
    centered, g, wsum = center_coords(coords, weights)
    feats = {"c": centered, "g": g}
    if has_energies:
        feats["energies"] = energies
    feats, valid, _ = _pad_block(feats, b, block)
    sim_fn = _make_rmsd_rot_corr_sim(thr, max_dE, use_maxdev, wsum, perms, use_pallas)
    return _blockwise_greedy(feats, valid, sim_fn, block)[:b]


def prune_by_rmsd_rot_corr(
    coords,
    atomnos=None,
    permutations=None,
    rmsd_thr: float = 0.5,
    energies=None,
    max_dE: float = 1.0,
    use_maxdev: bool = True,
    block: int = DEFAULT_BLOCK,
    max_perms: int = 60,
    mesh=None,
    use_pallas: bool | None = None,
    atom_mask=None,
    as_numpy: bool = True,
) -> np.ndarray:
    """RMSD prune where similarity is additionally checked under rotameric
    atom permutations (methyl/tBu/phenyl top rotations).

    permutations: i32[P, N] (identity excluded). If None, they are derived
    from the molecular graph of the first conformer (firecode_tpu.torsions.
    rotamer_permutations).

    atom_mask: optional bool[N] — padding lanes (bucketed variable-size
    molecules) are excluded from centering, RMSD, and max-deviation;
    permutations must act as the identity on padded slots.
    """
    coords = jnp.asarray(coords)
    b = coords.shape[0]
    if b <= 1:
        return np.ones(b, dtype=bool)
    if permutations is None:
        from firecode_tpu.torsions import rotamer_permutations

        if atomnos is None:
            raise ValueError("need atomnos to derive rotamer permutations")
        permutations = rotamer_permutations(
            np.asarray(atomnos), np.asarray(coords[0]), max_perms=max_perms
        )
    permutations = np.asarray(permutations, dtype=np.int32)
    if permutations.size == 0:
        return prune_by_rmsd(
            coords, atomnos, rmsd_thr, energies, max_dE, use_maxdev, block,
            atom_mask=atom_mask, mesh=mesh,
        )
    if mesh is not None and mesh.devices.size > 1 and atom_mask is None:
        # sharded engine has no atom-mask support; see prune_by_moi
        from firecode_tpu.parallel.sharded_prune import prune_by_rmsd_rot_corr_sharded

        return prune_by_rmsd_rot_corr_sharded(
            coords, atomnos, permutations, rmsd_thr, energies, max_dE,
            _shard_block(block, b, mesh), mesh, use_maxdev,
        )
    block = min(block, _pow2_at_most(b))
    has_energies = energies is not None
    if has_energies and int(np.shape(energies)[0]) != b:
        raise ValueError(
            f"energies length {np.shape(energies)[0]} does not match ensemble size {b}"
        )
    # device-side zeros when no energies: jnp.asarray(np.zeros(1e7)) ships
    # 40 MB of host zeros through the ~20 MB/s TPU tunnel (~2 s measured
    # at the 10M bench point)
    e = (
        jnp.asarray(energies, dtype=coords.dtype)
        if has_energies
        else jnp.zeros(b, dtype=coords.dtype)
    )
    has_mask = atom_mask is not None
    mask = jnp.asarray(
        atom_mask if has_mask else np.ones(coords.shape[1], dtype=bool)
    )
    keep = _prune_rmsd_rot_corr_device(
        coords,
        e,
        jnp.asarray(permutations),
        jnp.asarray(rmsd_thr, coords.dtype),
        jnp.asarray(max_dE, coords.dtype),
        use_maxdev,
        block,
        has_energies,
        pallas_default(use_maxdev) if use_pallas is None else use_pallas,
        mask,
        has_mask,
    )
    return np.asarray(keep) if as_numpy else keep


# --------------------------------------------------------------------------
# feature-space prunes (MOI, TFD)
# --------------------------------------------------------------------------


def _make_moi_sim(rel_tol, max_dE, compare: str = "all") -> SimFn:
    """Symmetric log-space MOI similarity: max_axis |log mi - log mj| <
    -log(1 - rel_tol), i.e. the per-axis moment RATIO lies within rel_tol.
    Equivalent (in exact arithmetic, up to the O(tol^2) band asymmetry) to
    |mi - mj| < rel_tol * max(mi, mj), but ~1.5x faster at the 1M scale:
    the pair kernel works on the precomputed `lm` feature instead of
    per-axis mul/max/compare chains.

    The two `compare` spellings produce the SAME booleans; XLA fuses them
    differently per engine path (measured on v5e at block 1024: "all" wins
    full-column at 100k, 0.119 vs 0.147 s; "max" wins the triangular loop
    at 1M, 1.99 vs 2.49 s)."""

    def sim_fn(row: dict, col: dict) -> jnp.ndarray:
        d = jnp.abs(row["lm"][:, None, :] - col["lm"][None, :, :])
        c = -jnp.log1p(-rel_tol)
        if compare == "all":
            sim = jnp.all(d < c, axis=-1)
        else:
            sim = jnp.max(d, axis=-1) < c
        return _energy_sim(row, col, sim, max_dE)

    return sim_fn


@partial(jax.jit, static_argnames=("block", "has_energies", "full_column"))
def _prune_moi_device(
    lm, energies, rel_tol, max_dE, block: int, has_energies: bool,
    full_column: bool = True,
) -> jnp.ndarray:
    # takes precomputed log-moments [B, 3] (see log_moments_chunked: moment
    # computation is row-chunked so 1e7-conformer ensembles never materialize
    # coordinate-sized transients here)
    b = lm.shape[0]
    feats = {"lm": lm}
    if has_energies:
        feats["energies"] = energies
    feats, valid, _ = _pad_block(feats, b, block)
    return _blockwise_greedy(
        feats, valid,
        _make_moi_sim(rel_tol, max_dE, compare="all" if full_column else "max"),
        block,
        full_column=full_column,
    )[:b]


# --------------------------------------------------------------------------
# grid-bucketed MOI engine (exact, for very large ensembles)
# --------------------------------------------------------------------------

# (dx, dy) neighbor-cell offsets: the dz in {-1, 0, 1} directions need no
# explicit offsets — packed ids of the three dz-cells are CONSECUTIVE
# integers, so each (dx, dy) pair's candidates live in ONE contiguous band
# of the sorted order (9 banded compares instead of 27)
_GRID_OFFSETS_XY = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]


def _cells_from_lm(lm, rel_tol):
    """Cell coordinates and packed int32 cell ids from log-moments.

    Cell edge = the similarity radius c, so ANY similar pair (max-axis
    |d log m| < c) lands in the same or an adjacent cell: the 27-cell
    neighborhood is a complete candidate superset, and every candidate is
    re-verified with the exact test — the engine is exact, the grid only
    bounds where similar pairs can live."""
    c = -jnp.log1p(-rel_tol)
    cell = jnp.floor(lm / c).astype(jnp.int32)
    cell = cell - jnp.min(cell, axis=0)
    n1 = jnp.max(cell[:, 1]) + 1
    n2 = jnp.max(cell[:, 2]) + 1
    cid = (cell[:, 0] * n1 + cell[:, 1]) * n2 + cell[:, 2]
    # packed range (f32: only a fallback guard against int32 overflow)
    prod = (
        (jnp.max(cell[:, 0]).astype(jnp.float32) + 1.0)
        * (n1.astype(jnp.float32))
        * (n2.astype(jnp.float32))
    )
    return c, cid, n1, n2, prod


@partial(jax.jit, static_argnames=("r_chunk",))
def _moi_grid_stats(lm, rel_tol, r_chunk: int = 512):
    """(max same-cell-id run length, packed-id range, band spread) — sizes
    the banded kernel's static [R, W] tile and guards the int32 packing.

    The band spread is the largest searchsorted gap between a row-chunk's
    first row at dz=-1 and last row at dz=+1 over the 9 (dx, dy) offsets:
    candidates of the whole chunk for one (dx, dy) pair live within
    spread + max_run contiguous sorted positions (the three dz-cells have
    consecutive packed ids, so they merge into one band)."""
    b = lm.shape[0]
    _, cid, n1, n2, prod = _cells_from_lm(lm, rel_tol)
    cid_s = jnp.sort(cid)
    new_run = jnp.concatenate(
        [jnp.ones(1, dtype=bool), cid_s[1:] != cid_s[:-1]]
    )
    run_id = jnp.cumsum(new_run) - 1
    lengths = jnp.zeros(b, dtype=jnp.int32).at[run_id].add(1)
    first = jnp.arange(0, b, r_chunk)
    last = jnp.minimum(first + r_chunk - 1, b - 1)
    deltas = jnp.stack(
        [(dx * n1 + dy) * n2 for dx, dy in _GRID_OFFSETS_XY]
    )

    def spread(d):
        s0 = jnp.searchsorted(cid_s, cid_s[first] + d - 1, side="left")
        s1 = jnp.searchsorted(cid_s, cid_s[last] + d + 1, side="left")
        return jnp.max(s1 - s0)

    return jnp.max(lengths), prod, jnp.max(jax.vmap(spread)(deltas))


# padded lanes get a sentinel cell id no real row can probe: real packed ids
# live in [0, prod) and offsets reach at most +-prod, so with the wrapper
# guard prod < 2**29 every real target stays < 2**30
_GRID_PAD_CID = np.int32(1 << 30)


@partial(jax.jit, static_argnames=("w", "r_chunk"))
def _banded_setup(lm, energies, rel_tol, w: int, r_chunk: int):
    """Sort by packed cell id, sentinel-pad, and precompute per-(offset,
    chunk) band starts for the banded MOI engine.

    The sweep needs no cell-id plane: the exact log-moment test ALREADY
    implies the 27-neighborhood (cell edge = similarity radius c, so
    max-axis |d log m| < c forces per-axis cell coords to differ by at most
    1) — the grid only chooses WHERE to look, never what matches. Each
    (dx, dy) band starts at the dz=-1 cell of the chunk's first row and is
    wide enough (via _moi_grid_stats) to cover dz=+1 of its last row."""
    b = lm.shape[0]
    bp = -(-max(b, w) // r_chunk) * r_chunk
    c, cid, n1, n2, _ = _cells_from_lm(lm, rel_tol)
    order = jnp.argsort(cid)  # stable: ties resolve by original index
    pad = bp - b
    cid_s = jnp.pad(cid[order], (0, pad), constant_values=_GRID_PAD_CID)
    lm_s = jnp.pad(lm[order], ((0, pad), (0, 0)))
    e_s = jnp.pad(energies[order], (0, pad))
    orig_s = jnp.pad(order.astype(jnp.int32), (0, pad), constant_values=bp)
    valid = jnp.arange(bp) < b

    deltas = jnp.stack(
        [(dx * n1 + dy) * n2 for dx, dy in _GRID_OFFSETS_XY]
    )  # [9] traced (n1/n2 are data-dependent)
    # band start per (offset, chunk) = candidate-run start of the chunk's
    # FIRST row at dz=-1; rows further into the chunk only look forward
    band_starts = jax.vmap(
        lambda d: jnp.searchsorted(cid_s, cid_s[::r_chunk] + d - 1, side="left")
    )(deltas)  # [9, C]
    band_starts = jnp.clip(band_starts, 0, bp - w)
    return c, lm_s, e_s, orig_s, order, valid, band_starts


@partial(
    jax.jit,
    static_argnames=("w", "r_chunk", "n_slab", "has_energies"),
    donate_argnums=(0,),
)
def _banded_sweep_slab(
    dead, keep_s, c, lm_s, e_s, orig_s, band_starts, max_dE,
    c0, w: int, r_chunk: int, n_slab: int, has_energies: bool,
):
    """One bounded slab of a Jacobi sweep: recompute dead[] for the n_slab
    row-chunks starting at chunk c0, against the CURRENT keep_s. Idempotent
    in (keep_s), so overlapping slabs (the clamped final slab) are safe.

    The per-element test is the EXACT similarity predicate (log-moment
    max-abs + energy gate + earlier-index) — no cell-id plane: any pair
    passing it is in the 27-neighborhood by construction, and band
    elements outside the neighborhood simply fail. Padded band lanes fail
    the earlier-index test (orig pad sentinel = bp > every real row)."""

    def chunk_body(i, dead):
        ci = c0 + i
        r0 = ci * r_chunk
        lm_r = lax.dynamic_slice_in_dim(lm_s, r0, r_chunk)
        e_r = lax.dynamic_slice_in_dim(e_s, r0, r_chunk)
        orig_r = lax.dynamic_slice_in_dim(orig_s, r0, r_chunk)
        dead_c = jnp.zeros(r_chunk, dtype=bool)
        for k in range(9):  # static unroll; buffers reuse across offsets
            b0 = band_starts[k, ci]
            lm_b = lax.dynamic_slice_in_dim(lm_s, b0, w)
            e_b = lax.dynamic_slice_in_dim(e_s, b0, w)
            orig_b = lax.dynamic_slice_in_dim(orig_s, b0, w)
            keep_b = lax.dynamic_slice_in_dim(keep_s, b0, w)
            sim = (
                jnp.max(jnp.abs(lm_b[None, :, :] - lm_r[:, None, :]), axis=-1)
                < c
            )
            if has_energies:
                sim &= jnp.abs(e_b[None, :] - e_r[:, None]) < max_dE
            sim &= orig_b[None, :] < orig_r[:, None]
            dead_c |= jnp.any(sim & keep_b[None, :], axis=1)
        return lax.dynamic_update_slice(dead, dead_c, (r0,))

    return lax.fori_loop(0, n_slab, chunk_body, dead)


# per-slab work budget (band elements compared): sized so one slab program
# runs a few seconds at most — the TPU tunnel on this box kills any single
# device program past roughly a minute, so each banded pass is driven
# from the host in bounded slab programs instead of one giant while_loop
_BAND_SLAB_BUDGET = 1 << 32
# undecided-subset size at which peeling hands off to the dense full-column
# engine (measured 0.12-0.2 s at this size on a v5e chip)
_PEEL_DENSE_MAX = 131072
# hard cap on peel levels: a pathological similarity chain shrinks the
# undecided set by O(1) per level; past this the dense engine finishes
_PEEL_MAX_LEVELS = 64


def _prune_moi_grid_device(
    lm, energies, rel_tol, max_dE, w: int, r_chunk: int, has_energies: bool,
) -> jnp.ndarray:
    """Exact greedy keep-first MOI prune via BANDED passes over the sorted
    cell-id order — the gather-free TPU form of spatial hashing.

    Candidates come from the 27-cell neighborhood of the log-moment grid
    (O(B * occupancy) pair tests instead of O(B^2)); the greedy fixpoint is
    resolved by monotone PEELING instead of plain Jacobi iteration (which
    oscillates between upper/lower keep bounds and took 16 full sweeps at
    the 10M bench point). Each level runs exactly two banded passes over
    the current undecided subset S:

      pass 1: has_earlier[i] = any earlier candidate in S
              -> rows without one are DEFINITE keepers (nothing in S can
                 kill them; everything outside S is already dead or has
                 had its kills applied)
      pass 2: dead[i] = any earlier definite keeper similar to i
              -> DEFINITE dead

    The remaining undecided rows are compacted (ascending original index,
    preserving greedy order) and the next level recurses on the subset —
    level sizes shrink geometrically in practice (10M -> 2.4M -> ~0.6M ->
    dense) — until the dense full-column engine finishes the job. Keep
    lists are identical to the dense engines and the numpy oracle: same
    similarity predicate, same earlier-index-wins order, and the reduction
    argument above is exact (a keeper's kills are final; a dead row kills
    nothing; undecided rows' fates depend only on earlier undecided rows).

    The TPU-critical details: (1) after sorting rows by packed cell id,
    the searchsorted start of each row's candidate run is MONOTONE in the
    row index (sorted queries into a sorted array), so the candidates of
    r_chunk consecutive rows all live in ONE contiguous band of static
    width w (= measured boundary spread + max run, from _moi_grid_stats);
    each pass is then per-chunk dynamic_slice + dense [R, W] tile
    compares — no gathers, which do not vectorize on the TPU VPU and made
    a gathered formulation 50x slower than the dense engine at 100k.
    The 27-cell neighborhood needs only NINE bands: the three dz-cells of
    each (dx, dy) offset have consecutive packed ids (one contiguous
    band), and the exact log-moment test subsumes the cell-id membership
    check (cell edge = similarity radius), so the sweep never touches the
    id plane at all — 3x fewer band elements per pass than the
    one-band-per-cell formulation it replaced (measured 19.3 -> 9.8 s for
    the 10M MOI stage on a v5e chip, keep count unchanged).
    (2) each pass is split into bounded slab programs driven from the
    host, so no single device program exceeds the tunnel's execution
    limit at 1e7 rows. Band transients are [r_chunk, w]-sized, so huge
    ensembles never allocate coordinate-scale buffers."""
    import os as _os
    import time as _time

    _dbg = _os.environ.get("FIRECODE_MOI_DEBUG") == "1"
    b = lm.shape[0]
    dtype = lm.dtype
    # ALL bookkeeping stays on device: at 1e7 rows the per-level index and
    # mask arrays are tens of MB, and the TPU tunnel on this class of box
    # moves ~20 MB/s — the original host-side scatter/sort/compact cost
    # 12+ s per level (measured), more than 3x the band passes themselves.
    # Only the final keep mask crosses to the host.
    keep_global = jnp.zeros(b, dtype=bool)
    orig_idx = jnp.arange(b, dtype=jnp.int32)  # subset position -> original row
    lm_cur = lm
    e_cur = energies
    w_cur = int(w)
    mde = jnp.asarray(max_dE, dtype)

    for level in range(_PEEL_MAX_LEVELS):
        u = int(lm_cur.shape[0])
        if u == 0:
            break
        if (
            u <= _PEEL_DENSE_MAX
            or w_cur > _BAND_MAX_W
            or level == _PEEL_MAX_LEVELS - 1
        ):
            # hand the remainder to the dense engine (array order == original
            # greedy order: compaction kept ascending original indices)
            if u == 1:
                keep_global = keep_global.at[orig_idx[0]].set(True)
            else:
                _td = _time.perf_counter()
                block = min(1024, _pow2_at_most(u))
                keep_sub = _prune_moi_device(
                    lm_cur, e_cur, rel_tol, mde, block, has_energies,
                    full_column=True,
                )
                # scatter through the subset->original map; dead rows hit
                # the drop-sentinel slot b (mode="drop")
                tgt = jnp.where(keep_sub, orig_idx, b)
                keep_global = keep_global.at[tgt].set(True, mode="drop")
                if _dbg:
                    keep_global.block_until_ready()
                    print(
                        f"    [moi-grid] dense tail u={u}: "
                        f"{_time.perf_counter() - _td:.2f}s",
                        flush=True,
                    )
            break

        _t0 = _time.perf_counter()
        (c, lm_s, e_s, orig_s, order, valid, band_starts) = (
            _banded_setup(lm_cur, e_cur, rel_tol, w_cur, r_chunk)
        )
        bp = lm_s.shape[0]
        n_chunks = bp // r_chunk
        n_slab = min(
            max(_BAND_SLAB_BUDGET // (9 * w_cur * r_chunk), 1), n_chunks
        )

        def run_pass(keep_s):
            dead = jnp.zeros(bp, dtype=bool)
            for c0 in range(0, n_chunks, n_slab):
                dead = _banded_sweep_slab(
                    dead, keep_s, c, lm_s, e_s, orig_s,
                    band_starts, mde,
                    # clamp: the final slab overlaps (idempotent)
                    min(c0, n_chunks - n_slab),
                    w_cur, r_chunk, n_slab, has_energies,
                )
            return dead

        if _dbg:
            band_starts.block_until_ready()
            _t1 = _time.perf_counter()
        has_earlier = run_pass(valid)
        if _dbg:
            has_earlier.block_until_ready()
            _t2 = _time.perf_counter()
        newkeep_s = valid & ~has_earlier  # definite keepers
        dead_s = run_pass(newkeep_s)  # definite dead (killed by a keeper)
        if _dbg:
            dead_s.block_until_ready()
            print(
                f"    [moi-grid] level {level}: u={u} w={w_cur} "
                f"setup={_t1 - _t0:.2f}s pass1={_t2 - _t1:.2f}s "
                f"pass2={_time.perf_counter() - _t2:.2f}s",
                flush=True,
            )
        undec_s = valid & ~newkeep_s & ~dead_s

        _t3 = _time.perf_counter()
        bp_s = orig_s.shape[0]
        # scatter the definite keepers into the ORIGINAL-index mask, all on
        # device (orig_s pad sentinel >= u never reaches the gather)
        sub_pos = jnp.minimum(orig_s, u - 1)
        tgt = jnp.where(newkeep_s, jnp.take(orig_idx, sub_pos), b)
        keep_global = keep_global.at[tgt].set(True, mode="drop")
        # compact the undecided subset in ascending ORIGINAL greedy order:
        # sort subset positions (pad/decided rows pushed past the end)
        n_undec = int(jnp.sum(undec_s))
        undec_pos = jnp.sort(jnp.where(undec_s, orig_s, bp_s))[:n_undec]
        orig_idx = jnp.take(orig_idx, undec_pos)
        lm_cur = jnp.take(lm_cur, undec_pos, axis=0)
        e_cur = jnp.take(e_cur, undec_pos, axis=0)
        if _dbg:
            lm_cur.block_until_ready()
            print(
                f"    [moi-grid] level {level} device compact "
                f"(u' = {n_undec}): {_time.perf_counter() - _t3:.2f}s",
                flush=True,
            )

        if n_undec > _PEEL_DENSE_MAX:
            # re-measure the band for the compacted subset (its spread and
            # runs shrink with it); a degenerate subset falls to dense
            max_run, prod, spread = _moi_grid_stats(
                lm_cur, rel_tol, r_chunk=r_chunk
            )
            w_need = max(int(spread) + int(max_run), 1)
            lane = max(r_chunk, 128)
            w_cur = max(r_chunk, -(-w_need // lane) * lane)
            if float(prod) >= 2**29:
                w_cur = _BAND_MAX_W + 1  # force the dense fallback

    return jnp.asarray(keep_global)


# banded engine limits: rows per chunk (the static [R, W] tile height), and
# the band-width ceiling past which the ensemble is so cell-degenerate that
# the dense engines are the better (and memory-safer) choice.
# R=256 minimizes pass cost (work per row is proportional to the band width
# w = chunk spread + max run, and spread grows with R): measured 10M steady
# state with the 9-band sweep 9.8 s at R=256 vs 10.2 s at R=512 vs 11.1 s
# at R=128 (tile overhead dominates below 256; same optimum as the
# 27-band sweep it replaced)
_BAND_R = 256
_BAND_MAX_W = 16384
# engine crossover: below this, the dense blockwise engines win outright
# (measured on a v5e chip; a gathered formulation of the grid engine was
# 50x slower than dense at 100k and killed the TPU worker at 1M — the
# banded sweep exists precisely because TPU gathers do not vectorize)
_GRID_MIN_B = 2_500_000


def prune_by_moi(
    coords,
    atomnos,
    rel_tol: float = 0.01,
    energies=None,
    max_dE: float = 1.0,
    block: int = 1024,
    mesh=None,
    atom_mask=None,
    as_numpy: bool = True,
) -> np.ndarray:
    """Moment-of-inertia similarity keep mask (energy-gated when available).

    atom_mask: optional bool[N] — False lanes are padding (bucketed
    variable-size molecules); their masses are zeroed so they cannot move
    the centre of mass or the principal moments."""
    coords = jnp.asarray(coords)
    b = coords.shape[0]
    if b <= 1:
        return np.ones(b, dtype=bool)
    if mesh is not None and mesh.devices.size > 1 and atom_mask is None:
        # (the sharded engine does not take an atom mask; masked/bucketed
        # ensembles run the single-device path rather than dropping the mask)
        from firecode_tpu.parallel.sharded_prune import prune_by_moi_sharded

        return prune_by_moi_sharded(
            coords, atomnos, rel_tol, energies, max_dE, _shard_block(block, b, mesh), mesh
        )
    masses = np.asarray(MASSES[np.asarray(atomnos)])
    if atom_mask is not None:
        masses = masses * np.asarray(atom_mask)
    masses = jnp.asarray(masses, dtype=coords.dtype)
    block = min(block, _pow2_at_most(b))
    has_energies = energies is not None
    if has_energies and int(np.shape(energies)[0]) != b:
        raise ValueError(
            f"energies length {np.shape(energies)[0]} does not match ensemble size {b}"
        )
    # device-side zeros when no energies: jnp.asarray(np.zeros(1e7)) ships
    # 40 MB of host zeros through the ~20 MB/s TPU tunnel (~2 s measured
    # at the 10M bench point)
    e = (
        jnp.asarray(energies, dtype=coords.dtype)
        if has_energies
        else jnp.zeros(b, dtype=coords.dtype)
    )
    rel = jnp.asarray(rel_tol, coords.dtype)
    mde = jnp.asarray(max_dE, coords.dtype)

    # the only coordinate-sized work: log principal moments, row-chunked so
    # 1e7-conformer ensembles never allocate coordinate-scale transients
    import os as _os
    import time as _time

    from firecode_tpu.ops.inertia import log_moments_chunked

    _dbg = _os.environ.get("FIRECODE_MOI_DEBUG") == "1"
    _t0 = _time.perf_counter()
    lm = log_moments_chunked(coords, masses)
    if _dbg:
        lm.block_until_ready()
        print(f"    [moi] log-moments: {_time.perf_counter() - _t0:.2f}s", flush=True)

    if b >= _GRID_MIN_B:
        # banded grid engine: O(B * band-width) dense tile tests instead of
        # O(B^2); exact (same keep lists). The band is sized by the measured
        # candidate spread; degenerate ensembles (everything in a few cells)
        # fall back to the dense path.
        _t1 = _time.perf_counter()
        max_run, prod, spread = _moi_grid_stats(lm, rel, r_chunk=_BAND_R)
        w_need = max(int(spread) + int(max_run), 1)
        if _dbg:
            print(f"    [moi] grid stats: {_time.perf_counter() - _t1:.2f}s", flush=True)
        if w_need <= _BAND_MAX_W and float(prod) < 2**29:
            # sweep work is linear in W: round up to the 128-lane VPU
            # width, not to a power of two (4096 vs the 2560 needed at
            # the 10M bench point is 1.6x wasted compares)
            w = max(_BAND_R, -(-w_need // 128) * 128)
            _t2 = _time.perf_counter()
            keep = _prune_moi_grid_device(
                lm, e, rel, mde, w, _BAND_R, has_energies
            )
            if _dbg:
                print(f"    [moi] grid engine total: {_time.perf_counter() - _t2:.2f}s", flush=True)
            return np.asarray(keep) if as_numpy else keep

    keep = _prune_moi_device(
        lm,
        e,
        rel,
        mde,
        block,
        has_energies,
        # the full-column engine recomputes every row block's similarity
        # against ALL columns (half of them later, i.e. wasted); at very
        # large ensembles the triangular column-loop path halves the work
        full_column=b <= 131072,
    )
    return np.asarray(keep) if as_numpy else keep


def _make_tfd_sim(thresh, max_dE) -> SimFn:
    def sim_fn(row: dict, col: dict) -> jnp.ndarray:
        delta = jnp.abs(row["tf"][:, None, :] - col["tf"][None, :, :])
        delta = jnp.abs(delta - (delta > 180.0) * 360.0)
        sim = jnp.sum(delta, axis=-1) < thresh
        return _energy_sim(row, col, sim, max_dE)

    return sim_fn


@partial(jax.jit, static_argnames=("block", "has_energies"))
def _prune_tfd_device(coords, quadruplets, energies, thresh, max_dE, block: int, has_energies: bool):
    b = coords.shape[0]
    tf = torsion_fingerprints(coords, quadruplets)
    feats = {"tf": tf}
    if has_energies:
        feats["energies"] = energies
    feats, valid, _ = _pad_block(feats, b, block)
    return _blockwise_greedy(
        feats, valid, _make_tfd_sim(thresh, max_dE), block, full_column=True
    )[:b]


def prune_by_tfd(
    coords,
    quadruplets,
    thresh: float = 10.0,
    energies=None,
    max_dE: float = 1.0,
    block: int = 1024,
    mesh=None,
    as_numpy: bool = True,
) -> np.ndarray:
    """Torsion-fingerprint-deviation keep mask (firecode csearch dedup)."""
    coords = jnp.asarray(coords)
    b = coords.shape[0]
    quadruplets = np.asarray(quadruplets, dtype=np.int32)
    if b <= 1 or quadruplets.size == 0:
        return np.ones(b, dtype=bool)
    if mesh is not None and mesh.devices.size > 1:
        from firecode_tpu.parallel.sharded_prune import prune_by_tfd_sharded

        return prune_by_tfd_sharded(
            coords, quadruplets, thresh, energies, max_dE, _shard_block(block, b, mesh), mesh
        )
    block = min(block, _pow2_at_most(b))
    has_energies = energies is not None
    if has_energies and int(np.shape(energies)[0]) != b:
        raise ValueError(
            f"energies length {np.shape(energies)[0]} does not match ensemble size {b}"
        )
    # device-side zeros when no energies: jnp.asarray(np.zeros(1e7)) ships
    # 40 MB of host zeros through the ~20 MB/s TPU tunnel (~2 s measured
    # at the 10M bench point)
    e = (
        jnp.asarray(energies, dtype=coords.dtype)
        if has_energies
        else jnp.zeros(b, dtype=coords.dtype)
    )
    keep = _prune_tfd_device(
        coords,
        jnp.asarray(quadruplets),
        e,
        jnp.asarray(thresh, coords.dtype),
        jnp.asarray(max_dE, coords.dtype),
        block,
        has_energies,
    )
    return np.asarray(keep) if as_numpy else keep


def _shard_block(block: int, b: int, mesh) -> int:
    """Block size for the sharded engine: <= requested, power of two, and
    small enough that padding to block * n_dev stays proportional to b."""
    return max(1, min(block, _pow2_at_most(max(b // mesh.devices.size, 1))))


def _pow2_at_most(n: int) -> int:
    p = 1
    while p * 2 <= n:
        p *= 2
    return p
