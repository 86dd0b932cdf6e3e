"""Native Langevin MD equilibration (jitted on device).

Capability parity with the reference's ASE-based NVT equilibration of
solvated boxes (firecode/md/equilibration.py:93-277): staged solvent-only
relaxation with the solute frozen, then free NVT dynamics, and a
solvent-scramble sanity check. The integrator is a jitted BAOAB-style
Langevin loop over the whole system — one device program instead of a
per-step Python loop through ASE.
"""

from __future__ import annotations

from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from firecode_tpu.io.xyz import write_xyz
from firecode_tpu.pt import MASSES, symbols_from_atomnos

# unit bookkeeping: E in kcal/mol, x in A, m in amu
# -> time unit: 1 t* = sqrt(amu * A^2 / (kcal/mol)) = 48.888 fs
_FS_PER_TIMEUNIT = 48.8882
_KB = 0.001987204259  # kcal/(mol K)


@partial(jax.jit, static_argnames=("calc", "n_steps"))
def _langevin_run(coords, masses, move_mask, key, T, dt, gamma, calc, n_steps: int):
    """BAOAB Langevin integrator; returns (coords, velocities, key)."""
    inv_m = 1.0 / masses[:, None]
    c1 = jnp.exp(-gamma * dt)
    c2 = jnp.sqrt((1.0 - c1 * c1) * _KB * T)

    def step(carry, _):
        x, v, key = carry
        _, f = calc.energy_and_forces(x)
        f = f * move_mask[:, None]
        v = v + 0.5 * dt * f * inv_m
        x = x + 0.5 * dt * v * move_mask[:, None]
        key, sub = jax.random.split(key)
        noise = jax.random.normal(sub, x.shape, x.dtype)
        v = c1 * v + c2 * jnp.sqrt(inv_m) * noise * move_mask[:, None]
        x = x + 0.5 * dt * v * move_mask[:, None]
        _, f = calc.energy_and_forces(x)
        f = f * move_mask[:, None]
        v = v + 0.5 * dt * f * inv_m
        return (x, v, key), None

    (x, v, key), _ = jax.lax.scan(step, (coords, jnp.zeros_like(coords), key), None, length=n_steps)
    return x, v, key


def run_md_equilibration(
    calc,
    atomnos: np.ndarray,
    coords: np.ndarray,
    T: float = 298.15,
    dt_fs: float = 1.0,
    n_steps: int = 1000,
    frozen_atoms: np.ndarray | None = None,
    seed: int = 0,
) -> np.ndarray:
    """NVT Langevin equilibration; returns final coordinates."""
    masses = jnp.asarray(MASSES[np.asarray(atomnos)], dtype=jnp.float32)
    move = np.ones(len(atomnos), dtype=bool)
    if frozen_atoms is not None:
        move[np.asarray(frozen_atoms, dtype=int)] = False
    x, _, _ = _langevin_run(
        jnp.asarray(coords, jnp.float32),
        masses,
        jnp.asarray(move),
        jax.random.PRNGKey(seed),
        jnp.asarray(T, jnp.float32),
        jnp.asarray(dt_fs / _FS_PER_TIMEUNIT, jnp.float32),
        jnp.asarray(0.1, jnp.float32),
        calc,
        n_steps,
    )
    return np.asarray(x, dtype=np.float64)


def check_solvent_scramble(
    solute_coords: np.ndarray, box_coords: np.ndarray, n_solute: int, thr: float = 2.0
) -> bool:
    """True if the solute stayed intact (max displacement under thr A after
    centroid alignment) — firecode/md/equilibration.py:254-276 analog."""
    before = solute_coords - solute_coords.mean(axis=0)
    after = box_coords[:n_solute] - box_coords[:n_solute].mean(axis=0)
    return bool(np.max(np.linalg.norm(after - before, axis=1)) < thr)


def equilibrate(filename: str, embedder) -> str:
    """Staged equilibration operator: solvent relax (solute frozen) -> full."""
    mol = next(m for m in embedder.objects if m.filename == filename)
    calc = embedder.dispatcher.get_batch_calc(
        mol.atomnos, mol.coords[0], graph=mol.graph
    )
    n_solute = getattr(mol, "n_solute", mol.n_atoms)

    embedder.log("    MD stage 1: solvent-only NVT (solute frozen)")
    coords = run_md_equilibration(
        calc, mol.atomnos, mol.coords[0], T=embedder.options.T,
        frozen_atoms=np.arange(n_solute) if n_solute < mol.n_atoms else None,
        n_steps=500,
    )
    embedder.log("    MD stage 2: full NVT")
    coords = run_md_equilibration(
        calc, mol.atomnos, coords, T=embedder.options.T, n_steps=500
    )

    if n_solute < mol.n_atoms and not check_solvent_scramble(
        mol.coords[0][:n_solute], coords, n_solute
    ):
        embedder.warn("--> WARNING: solute may have scrambled during MD equilibration")

    outname = f"{Path(filename).stem}_equilibrated.xyz"
    write_xyz(outname, symbols_from_atomnos(mol.atomnos), coords)
    return outname
