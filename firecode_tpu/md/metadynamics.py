"""Native batched RMSD metadynamics (the capability the reference outsources
to the CREST binary, firecode/interfaces/crest.py:444).

CREST/xtb-style MTD: Langevin dynamics on E(x) + V_bias(x) where the bias is
a sum of Gaussians in the MINIMUM-RMSD collective variable against the
deposited reference structures,

    V_bias(x) = sum_g k_push * exp( -rmsd(x, ref_g)^2 / (2 alpha^2) ),

so visited basins are progressively pushed out of. The RMSD is the QCP
kernel (ops/rmsd.py), which is smooth and differentiable — the bias force
comes from plain autodiff through the Newton iteration, and rotation/
translation invariance of the CV is inherited from min-RMSD itself.

TPU-first design: W walkers run as ONE jitted batched program (vmapped
Langevin + per-walker Gaussian history in device memory), something the
CPU reference cannot express — CREST runs trajectories as separate
processes. Deposited snapshots come back as a conformer ensemble that the
standard cascade + optimizer then refines (mtd_native> operator,
driver/operators.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from firecode_tpu.calculators.base import Calculator, efs_for
from firecode_tpu.ops.rmsd import (
    _pairwise_correlation,
    _qcp_lambda_max,
    center_coords,
)
from firecode_tpu.pt import MASSES

_KB = 0.001987204259  # kcal/(mol K)
_FS = 1.0 / 48.8882  # fs -> internal time unit sqrt(amu A^2 / (kcal/mol))


def _bias_energy(x, hist_w, n_alive, k_push, alpha, n_gauss):
    """Sum of RMSD Gaussians against the live part of one walker's history.

    Evaluated in SQUARED min-RMSD: the Gaussian only needs rmsd^2, and
    d(rmsd)/dx is singular exactly at a Gaussian center (the walker sits on
    its own just-deposited reference every deposit step) — the square keeps
    the bias force smooth there."""
    ac, ga, wsum = center_coords(x[None])
    bc, gb, _ = center_coords(hist_w)
    s = _pairwise_correlation(ac, bc)
    lam = _qcp_lambda_max(s, ga[:, None], gb[None, :])
    rm2 = jnp.maximum(ga[:, None] + gb[None, :] - 2.0 * lam, 0.0)[0] / wsum  # [G]
    alive = jnp.arange(n_gauss) < n_alive
    return jnp.sum(
        jnp.where(alive, k_push * jnp.exp(-rm2 / (2.0 * alpha * alpha)), 0.0)
    )


@partial(jax.jit, static_argnames=("calc", "n_steps", "dep_every", "n_gauss"))
def _mtd_run(
    coords_w, masses, key, T, dt, gamma, k_push, alpha,
    calc: Calculator, n_steps: int, dep_every: int, n_gauss: int,
    hist0=None, n_seed=None,
):
    """Batched MTD: [W, N, 3] walkers, per-walker Gaussian history.

    With hist0/n_seed (goat_native, md/goat.py), the history starts
    pre-seeded: slots [0, n_seed) of hist0 are live bias centers from the
    first step (the shared known-conformer pool that walkers are pushed
    away from), and new deposits append after them. n_seed is traced, so
    a growing pool re-uses one compiled program at fixed n_gauss."""
    w, n, _ = coords_w.shape
    inv_m = 1.0 / masses[:, None]
    c1 = jnp.exp(-gamma * dt)
    c2 = jnp.sqrt((1.0 - c1 * c1) * _KB * T)

    # base forces through the stateful fast path when available (GFN-FF
    # variational EEQ warm-started across MD steps — see opt/fire.py);
    # the history bias is coordinate-only, so its gradient composes
    base_efs, aux_init = efs_for(calc)
    aux0 = aux_init(coords_w)

    grad_bias = jax.grad(_bias_energy)

    def forces(xs, hist, n_alive, aux):
        _, f_base, aux = base_efs(xs, aux)
        gb = jax.vmap(
            lambda x, h: grad_bias(x, h, n_alive, k_push, alpha, n_gauss)
        )(xs, hist)
        return f_base - gb, aux

    if hist0 is None:
        hist0 = jnp.zeros((w, n_gauss, n, 3), coords_w.dtype)
        hist0 = hist0.at[:, 0].set(coords_w)
        n_seed = jnp.asarray(1, jnp.int32)

    def step(carry, i):
        x, v, hist, key, aux = carry
        n_alive = n_seed + i // dep_every
        f, aux = forces(x, hist, n_alive, aux)
        v = v + 0.5 * dt * f * inv_m
        x = x + 0.5 * dt * v
        key, sub = jax.random.split(key)
        v = c1 * v + c2 * jnp.sqrt(inv_m) * jax.random.normal(sub, x.shape, x.dtype)
        x = x + 0.5 * dt * v
        f, aux = forces(x, hist, n_alive, aux)
        v = v + 0.5 * dt * f * inv_m
        # deposit a new Gaussian every dep_every steps (ring-free: capped)
        slot = jnp.minimum(n_alive, n_gauss - 1)
        do_dep = (i % dep_every) == (dep_every - 1)
        hist = jnp.where(
            do_dep,
            hist.at[:, slot].set(x),
            hist,
        )
        return (x, v, hist, key, aux), None

    v0 = jnp.zeros_like(coords_w)
    (x, v, hist, key, _), _ = jax.lax.scan(
        step, (coords_w, v0, hist0, key, aux0), jnp.arange(n_steps)
    )
    n_dep = min(n_steps // dep_every + 1, n_gauss)
    return x, hist, n_dep


def shard_walkers(mesh, *arrays):
    """Shard the leading (walker) axis of each array over the mesh's "ens"
    axis, padding to a device-count multiple by repeating the first walker
    (padded rows are dropped by slicing outputs back to the real count).

    Walkers never interact — no cross-walker reduction exists anywhere in
    the MTD program — so the sharded run is the same math per walker and
    XLA propagates the input sharding through the whole scan."""
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    n_dev = int(mesh.devices.size)
    w = arrays[0].shape[0]
    w_pad = -(-w // n_dev) * n_dev
    out = []
    for a in arrays:
        a = jnp.asarray(a)
        if w_pad != w:
            pad = jnp.broadcast_to(a[:1], (w_pad - w, *a.shape[1:]))
            a = jnp.concatenate([a, pad], axis=0)
        spec = P("ens", *([None] * (a.ndim - 1)))
        out.append(jax.device_put(a, NamedSharding(mesh, spec)))
    return out[0] if len(out) == 1 else out


def run_mtd(
    calc: Calculator,
    atomnos: np.ndarray,
    coords: np.ndarray,
    n_walkers: int = 8,
    n_steps: int = 3000,
    dep_every: int = 150,
    k_push: float = 3.0,
    alpha: float = 0.6,
    temperature: float = 500.0,
    dt_fs: float = 1.0,
    gamma_fs: float = 0.02,
    seed: int = 0,
    jitter: float = 0.02,
    mesh=None,
) -> np.ndarray:
    """Run batched RMSD metadynamics; returns the deposited snapshot
    ensemble [W * n_deposits, N, 3] (unoptimized — feed it to the cascade
    + optimizer like any raw conformer pool).

    coords: one structure [N, 3] (walkers start from jittered copies) or a
    walker batch [W, N, 3]. k_push (kcal/mol) and alpha (A) follow CREST's
    k/alpha roles; temperature defaults high (500 K) for basin hopping.
    mesh: optional jax.sharding.Mesh with an "ens" axis — the walker axis
    is sharded over it (walkers are independent, so scaling rides ICI with
    zero collectives; padded walkers are dropped from the output).
    """
    coords = np.asarray(coords, dtype=np.float64)
    if coords.ndim == 2:
        rng = np.random.default_rng(seed)
        coords = coords[None] + jitter * rng.normal(
            size=(n_walkers, *coords.shape)
        )
    w = coords.shape[0]
    n_gauss = n_steps // dep_every + 1
    masses = jnp.asarray(MASSES[np.asarray(atomnos)])
    key = jax.random.PRNGKey(seed)
    coords_j = jnp.asarray(coords)
    if mesh is not None:
        coords_j = shard_walkers(mesh, coords_j)
    _, hist, n_dep = _mtd_run(
        coords_j,
        masses,
        key,
        jnp.asarray(float(temperature)),
        jnp.asarray(dt_fs * _FS),
        jnp.asarray(gamma_fs / _FS),
        jnp.asarray(float(k_push)),
        jnp.asarray(float(alpha)),
        calc,
        int(n_steps),
        int(dep_every),
        int(n_gauss),
    )
    out = np.asarray(hist[:w, :n_dep]).reshape(w * n_dep, *coords.shape[1:])
    return out
