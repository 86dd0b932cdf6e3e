"""Multi-chip sharded greedy pruning over an ensemble mesh.

The blockwise greedy cascade (firecode_tpu.prune.cascade) is sequential over
ROW blocks, but each row block's comparison against all earlier structures is
embarrassingly parallel over the COLUMN (ensemble) axis. Here that axis is
sharded over the 1D "ens" mesh with shard_map:

  - every device holds one shard of the feature arrays and of the keep mask;
  - for each row block, the owner broadcasts it (psum of a masked slice);
  - each device compares the block against ITS shard (tiled to bound memory),
    reduces locally, and a psum combines the per-device "killed" verdicts;
  - the within-block greedy resolution (Jacobi fixpoint, cheap) runs
    replicated on every device.

Keep-lists are bit-identical to the single-device cascade: the comparison
order is preserved exactly, only the column reductions are distributed.
Collectives: one psum per row block (K bools) + one tiny psum for the block
broadcast — all riding ICI.

The engine is generic over the similarity criterion: the same kernel serves
RMSD (+max-deviation), rotamer-corrected RMSD, moment-of-inertia, and
torsion-fingerprint pruning — the full cascade of the reference's
similarity_refining (firecode/embedder.py:1412-1516) distributed over the
device mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from firecode_tpu.ops.inertia import inertia_moments
from firecode_tpu.ops.rmsd import center_coords
from firecode_tpu.ops.torsion_ops import torsion_fingerprints
from firecode_tpu.parallel.mesh import ensemble_mesh
from firecode_tpu.prune.cascade import (
    _make_moi_sim,
    _make_rmsd_rot_corr_sim,
    _make_rmsd_sim,
    _make_tfd_sim,
    _resolve_block_greedy,
)
from firecode_tpu.pt import MASSES


def _shard_pad(b: int, block: int, n_dev: int) -> int:
    """Padded size: multiple of block and of (block * n_dev) for even shards."""
    unit = block * n_dev
    return max(unit, -(-b // unit) * unit)


def _sharded_greedy_kernel(feats: dict, valid, sim_fn, block: int, shard: int):
    """Per-device body (runs under shard_map over the "ens" axis).

    feats values and valid have leading dim = shard (this device's slice).
    Invocation orientation matches cascade._blockwise_greedy exactly:
    column pass sim_fn(col, row), in-block sim_fn(row, row).
    """
    bp = shard * lax.axis_size("ens")
    nblocks = bp // block
    my = lax.axis_index("ens")
    keep_sh = lax.pcast(jnp.zeros(shard, dtype=bool), ("ens",), to="varying")

    def outer(bi, keep_sh):
        start = bi * block
        owner = start // shard  # block never straddles shards (block | shard)
        local_start = start - owner * shard
        is_owner = my == owner

        def bcast(v):
            sl = lax.dynamic_slice_in_dim(v, local_start, block, 0)
            if sl.dtype == jnp.bool_:
                return lax.psum((sl & is_owner).astype(jnp.int32), "ens").astype(bool)
            gate = jnp.where(is_owner, 1.0, 0.0).astype(sl.dtype)
            return lax.psum(sl * gate, "ens")

        row = {k: bcast(v) for k, v in feats.items()}
        row_valid = bcast(valid)

        # my shard vs the row block, tiled over my local column blocks
        def col(ci, dead):
            cs = ci * block
            col_f = {
                k: lax.dynamic_slice_in_dim(v, cs, block, 0) for k, v in feats.items()
            }
            col_keep = lax.dynamic_slice_in_dim(keep_sh, cs, block, 0)
            col_global = my * shard + cs + jnp.arange(block)
            sim = sim_fn(col_f, row)
            earlier = (col_global < start)[:, None]
            return dead | jnp.any(sim & col_keep[:, None] & earlier, axis=0)

        dead = lax.fori_loop(
            0,
            shard // block,
            col,
            lax.pcast(jnp.zeros(block, dtype=bool), ("ens",), to="varying"),
        )
        dead = lax.psum(dead.astype(jnp.int32), "ens").astype(bool)

        # within-block greedy (replicated, deterministic)
        sim_in = sim_fn(row, row)
        kb = _resolve_block_greedy(sim_in, row_valid & ~dead)

        # owner writes the result into its keep shard
        updated = lax.dynamic_update_slice_in_dim(keep_sh, kb, local_start, 0)
        return jnp.where(is_owner, updated, keep_sh)

    return lax.fori_loop(0, nblocks, outer, keep_sh)


@partial(
    jax.jit,
    static_argnames=("kind", "block", "has_energies", "use_maxdev", "mesh", "use_pallas"),
)
def _sharded_prune_jit(
    feats: dict,
    e,
    thr,
    max_dE,
    wsum,
    perms,
    b: int,
    kind: str,
    block: int,
    has_energies: bool,
    use_maxdev: bool,
    mesh: Mesh,
    use_pallas: bool = False,
):
    n_dev = mesh.devices.size
    bp = _shard_pad(int(feats[next(iter(feats))].shape[0]), block, n_dev)
    shard = bp // n_dev

    if kind == "rmsd":
        sim_fn = _make_rmsd_sim(thr, max_dE, use_maxdev, wsum, use_pallas=use_pallas)
    elif kind == "rot_corr":
        sim_fn = _make_rmsd_rot_corr_sim(
            thr, max_dE, use_maxdev, wsum, perms, use_pallas=use_pallas
        )
    elif kind == "moi":
        sim_fn = _make_moi_sim(thr, max_dE)
    elif kind == "tfd":
        sim_fn = _make_tfd_sim(thr, max_dE)
    else:  # pragma: no cover
        raise ValueError(kind)

    b0 = feats[next(iter(feats))].shape[0]
    pad = bp - b0
    feats = {
        k: jnp.pad(v, [(0, pad)] + [(0, 0)] * (v.ndim - 1)) for k, v in feats.items()
    }
    if has_energies:
        feats["energies"] = jnp.pad(e, (0, pad))
    valid = jnp.arange(bp) < b

    from jax import shard_map

    kernel = shard_map(
        lambda f, v: _sharded_greedy_kernel(f, v, sim_fn, block, shard),
        mesh=mesh,
        in_specs=({k: P("ens") for k in feats}, P("ens")),
        out_specs=P("ens"),
    )
    return kernel(feats, valid)


def _run_sharded(feats, b, e, thr, max_dE, kind, block, mesh, *,
                 wsum=None, perms=None, use_maxdev=False) -> np.ndarray:
    from firecode_tpu.prune.cascade import pallas_default

    mesh = mesh or ensemble_mesh()
    dtype = feats[next(iter(feats))].dtype
    has_energies = e is not None
    if has_energies and int(np.shape(e)[0]) != b:
        raise ValueError(
            f"energies length {np.shape(e)[0]} does not match ensemble size {b}"
        )
    # NOTE: the fused Pallas tiles are plumbed through (use_pallas static
    # arg + vma unification in ops/pallas_qcp.py) but stay OFF under
    # shard_map for now: pallas_call under vma-checked shard_map still
    # rejects mixed replicated/varying operands inside its own block
    # machinery (dynamic_slice vma mismatch) on this JAX version. The
    # single-chip cascade — the benchmarked config — runs full Pallas.
    del pallas_default
    use_pallas = False
    keep = _sharded_prune_jit(
        feats,
        jnp.asarray(e, dtype) if has_energies else jnp.zeros(b, dtype),
        jnp.asarray(thr, dtype),
        jnp.asarray(max_dE, dtype),
        jnp.asarray(wsum if wsum is not None else 0.0, dtype),
        jnp.asarray(
            perms if perms is not None else np.zeros((0, 0), np.int32), jnp.int32
        ),
        b,
        kind,
        block,
        has_energies,
        use_maxdev,
        mesh,
        use_pallas,
    )
    return np.asarray(keep)[:b]


def prune_by_rmsd_sharded(
    coords,
    rmsd_thr: float = 0.5,
    energies=None,
    max_dE: float = 1.0,
    block: int = 512,
    mesh: Mesh | None = None,
    use_maxdev: bool = True,
    atom_mask=None,
) -> np.ndarray:
    """Greedy RMSD keep mask with the column axis sharded over the mesh.

    Same double criterion as the single-chip path (rmsd < thr AND max
    deviation < 2*thr when use_maxdev) — keep-lists are bit-identical to
    prune_by_rmsd for any device count.
    """
    coords = jnp.asarray(coords)
    b = coords.shape[0]
    if b <= 1:
        return np.ones(b, dtype=bool)
    weights = (
        jnp.asarray(atom_mask).astype(coords.dtype) if atom_mask is not None else None
    )
    centered, g, wsum = center_coords(coords, weights)
    return _run_sharded(
        {"c": centered, "g": g}, b, energies, rmsd_thr, max_dE, "rmsd", block, mesh,
        wsum=wsum, use_maxdev=use_maxdev,
    )


def prune_by_rmsd_rot_corr_sharded(
    coords,
    atomnos=None,
    permutations=None,
    rmsd_thr: float = 0.5,
    energies=None,
    max_dE: float = 1.0,
    block: int = 512,
    mesh: Mesh | None = None,
    use_maxdev: bool = True,
    max_perms: int = 60,
) -> np.ndarray:
    """Sharded rotamer-corrected RMSD prune (cascade.prune_by_rmsd_rot_corr)."""
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
        return prune_by_rmsd_sharded(
            coords, rmsd_thr, energies, max_dE, block, mesh, use_maxdev
        )
    centered, g, wsum = center_coords(coords)
    return _run_sharded(
        {"c": centered, "g": g}, b, energies, rmsd_thr, max_dE, "rot_corr", block,
        mesh, wsum=wsum, perms=permutations, use_maxdev=use_maxdev,
    )


def prune_by_moi_sharded(
    coords,
    atomnos,
    rel_tol: float = 0.01,
    energies=None,
    max_dE: float = 1.0,
    block: int = 1024,
    mesh: Mesh | None = None,
) -> np.ndarray:
    """Sharded moment-of-inertia similarity prune (cascade.prune_by_moi)."""
    coords = jnp.asarray(coords)
    b = coords.shape[0]
    if b <= 1:
        return np.ones(b, dtype=bool)
    masses = jnp.asarray(MASSES[np.asarray(atomnos)], dtype=coords.dtype)
    moments = inertia_moments(coords, masses)
    # log-moment feature for the symmetric ratio similarity (cascade._make_moi_sim)
    return _run_sharded(
        {"lm": jnp.log(jnp.maximum(moments, 1e-30))},
        b, energies, rel_tol, max_dE, "moi", block, mesh
    )


def prune_by_tfd_sharded(
    coords,
    quadruplets,
    thresh: float = 10.0,
    energies=None,
    max_dE: float = 1.0,
    block: int = 1024,
    mesh: Mesh | None = None,
) -> np.ndarray:
    """Sharded torsion-fingerprint-deviation prune (cascade.prune_by_tfd)."""
    coords = jnp.asarray(coords)
    b = coords.shape[0]
    quadruplets = np.asarray(quadruplets, dtype=np.int32)
    if b <= 1 or quadruplets.size == 0:
        return np.ones(b, dtype=bool)
    tf = torsion_fingerprints(coords, jnp.asarray(quadruplets))
    return _run_sharded({"tf": tf}, b, energies, thresh, max_dE, "tfd", block, mesh)
