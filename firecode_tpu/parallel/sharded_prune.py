"""Multi-chip sharded greedy pruning over an ensemble mesh.

The blockwise greedy cascade (firecode_tpu.prune.cascade) is sequential over
ROW blocks, but each row block's comparison against all earlier structures is
embarrassingly parallel over the COLUMN (ensemble) axis. Here that axis is
sharded over the 1D "ens" mesh with shard_map:

  - every device holds one shard of the (centered) feature arrays and of the
    keep mask;
  - for each row block, the owner broadcasts it (psum of a masked slice);
  - each device compares the block against ITS shard (tiled to bound memory),
    reduces locally, and a psum combines the per-device "killed" verdicts;
  - the within-block greedy resolution (Jacobi fixpoint, cheap) runs
    replicated on every device.

Keep-lists are bit-identical to the single-device cascade: the comparison
order is preserved exactly, only the column reductions are distributed.
Collectives: one psum per row block (K bools) + one tiny psum for the block
broadcast — all riding ICI.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from firecode_tpu.ops.rmsd import center_coords
from firecode_tpu.parallel.mesh import ensemble_mesh
from firecode_tpu.prune.cascade import _resolve_block_greedy, _rmsd_maxdev_block


def _shard_pad(b: int, block: int, n_dev: int) -> int:
    """Padded size: multiple of block and of (block * n_dev) for even shards."""
    unit = block * n_dev
    return max(unit, -(-b // unit) * unit)


def prune_by_rmsd_sharded(
    coords,
    rmsd_thr: float = 0.5,
    energies=None,
    max_dE: float = 1.0,
    block: int = 512,
    mesh: Mesh | None = None,
    use_maxdev: bool = True,
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
    mesh = mesh or ensemble_mesh()
    n_dev = mesh.devices.size

    bp = _shard_pad(b, block, n_dev)
    pad = bp - b

    centered, g, wsum = center_coords(coords)
    centered = jnp.pad(centered, ((0, pad), (0, 0), (0, 0)))
    g = jnp.pad(g, (0, pad))
    has_energies = energies is not None
    e = jnp.pad(
        jnp.asarray(energies if has_energies else np.zeros(b), coords.dtype), (0, pad)
    )
    valid = jnp.arange(bp) < b

    keep = _prune_rmsd_sharded_jit(
        centered,
        g,
        e,
        valid,
        jnp.asarray(rmsd_thr, coords.dtype),
        jnp.asarray(max_dE, coords.dtype),
        wsum,
        block,
        has_energies,
        use_maxdev,
        mesh,
    )
    return np.asarray(keep)[:b]


@partial(
    jax.jit,
    static_argnames=("block", "has_energies", "use_maxdev", "mesh"),
)
def _prune_rmsd_sharded_jit(
    centered, g, e, valid, thr, max_dE, wsum, block: int, has_energies: bool,
    use_maxdev: bool, mesh: Mesh
):
    n_dev = mesh.devices.size
    bp = centered.shape[0]
    shard = bp // n_dev
    nblocks = bp // block

    def kernel(c_sh, g_sh, e_sh, valid_sh):
        """Runs per device; *_sh have leading dim = shard."""
        my = lax.axis_index("ens")
        keep_sh = lax.pcast(jnp.zeros(shard, dtype=bool), ("ens",), to="varying")

        def outer(bi, keep_sh):
            start = bi * block
            # broadcast the row block: owner contributes, others zero
            owner = start // shard  # block never straddles shards (block|shard)
            local_start = start - owner * shard
            is_owner = my == owner
            row_c = lax.dynamic_slice_in_dim(c_sh, local_start, block, 0)
            row_g = lax.dynamic_slice_in_dim(g_sh, local_start, block, 0)
            row_e = lax.dynamic_slice_in_dim(e_sh, local_start, block, 0)
            row_valid = lax.dynamic_slice_in_dim(valid_sh, local_start, block, 0)
            zero = jnp.where(is_owner, 1.0, 0.0).astype(row_c.dtype)
            row_c = lax.psum(row_c * zero, "ens")
            row_g = lax.psum(row_g * zero, "ens")
            row_e = lax.psum(row_e * zero, "ens")
            row_valid = lax.psum(
                (row_valid & is_owner).astype(jnp.int32), "ens"
            ).astype(bool)

            # my shard vs the row block, tiled over my local column blocks
            def col(ci, dead):
                cs = ci * block
                col_c = lax.dynamic_slice_in_dim(c_sh, cs, block, 0)
                col_g = lax.dynamic_slice_in_dim(g_sh, cs, block, 0)
                col_e = lax.dynamic_slice_in_dim(e_sh, cs, block, 0)
                col_keep = lax.dynamic_slice_in_dim(keep_sh, cs, block, 0)
                col_global = my * shard + cs + jnp.arange(block)
                rmsd, maxdev = _rmsd_maxdev_block(
                    col_c, col_g, row_c, row_g, wsum, use_maxdev, thr=thr
                )
                sim = rmsd < thr
                if maxdev is not None:
                    sim = sim & (maxdev < 2.0 * thr)
                if has_energies:
                    sim = sim & (jnp.abs(col_e[:, None] - row_e[None, :]) < max_dE)
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
            rmsd, maxdev = _rmsd_maxdev_block(
                row_c, row_g, row_c, row_g, wsum, use_maxdev, thr=thr
            )
            sim_in = rmsd < thr
            if maxdev is not None:
                sim_in = sim_in & (maxdev < 2.0 * thr)
            if has_energies:
                sim_in = sim_in & (
                    jnp.abs(row_e[:, None] - row_e[None, :]) < max_dE
                )
            kb = _resolve_block_greedy(sim_in, row_valid & ~dead)

            # owner writes the result into its keep shard
            updated = lax.dynamic_update_slice_in_dim(keep_sh, kb, local_start, 0)
            return jnp.where(is_owner, updated, keep_sh)

        return lax.fori_loop(0, nblocks, outer, keep_sh)

    from jax import shard_map

    kernel_sharded = shard_map(
        kernel,
        mesh=mesh,
        in_specs=(P("ens"), P("ens"), P("ens"), P("ens")),
        out_specs=P("ens"),
    )
    return kernel_sharded(centered, g, e, valid)
