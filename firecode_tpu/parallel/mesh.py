"""Multi-chip ensemble sharding (ICI data-parallel axis).

The reference's parallelism is a process pool over structures
(firecode/embedder.py:2085-2242, SURVEY.md section 2.3 P1). The TPU-native
equivalent: the ensemble axis B is sharded over a 1D device mesh ("ens"); the
calculator, optimizer, and similarity kernels are pure batched functions, so
sharding is a single NamedSharding annotation and XLA inserts the collectives.

Cross-shard reductions used here:
- global energy statistics: psum/pmin over the mesh;
- pairwise similarity vs the whole ensemble: each shard all_gathers the
  (small) feature block it compares against — coordinates stay sharded.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def ensemble_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1D mesh over the ensemble axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), axis_names=("ens",))


def shard_ensemble(coords: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """Place [B, N, 3] with B sharded over the "ens" axis."""
    sharding = NamedSharding(mesh, P("ens"))
    return jax.device_put(coords, sharding)


def sharded_pipeline_step(calc, mesh: Mesh):
    """A jitted full pipeline step over a sharded ensemble.

    One step = FF energies + forces (data-parallel), a steepest-descent
    position update, global min/mean energy via cross-shard reduction, and a
    per-structure similarity feature (inertia moments) compared against the
    all-gathered ensemble — the communication pattern of the sharded prune.

    Returns step(coords[B, N, 3], masses[N]) ->
    (new_coords, energies[B], e_min[], n_similar[B]).
    """

    @partial(
        jax.jit,
        in_shardings=(NamedSharding(mesh, P("ens")), NamedSharding(mesh, P())),
        out_shardings=(
            NamedSharding(mesh, P("ens")),
            NamedSharding(mesh, P("ens")),
            NamedSharding(mesh, P()),
            NamedSharding(mesh, P("ens")),
        ),
    )
    def step(coords, masses):
        e, f = calc.energy_and_forces(coords)
        new_coords = coords + 0.001 * f

        e_min = jnp.min(e)

        from firecode_tpu.ops.inertia import inertia_moments

        moments = inertia_moments(new_coords, masses)  # [B, 3] sharded
        # compare each structure against the full ensemble's moments;
        # XLA turns the broadcast into an all_gather of the small feature
        rel = jnp.abs(moments[:, None, :] - moments[None, :, :])
        sim = jnp.all(rel < 0.01 * jnp.maximum(jnp.abs(moments[:, None, :]), 1e-9), axis=-1)
        n_similar = jnp.sum(sim, axis=-1) - 1  # exclude self

        return new_coords, e, e_min, n_similar

    return step
