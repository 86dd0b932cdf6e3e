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

from firecode_tpu.calculators.base import efs_for
from firecode_tpu.io.xyz import write_xyz
from firecode_tpu.pt import MASSES, symbols_from_atomnos

# unit bookkeeping: E in kcal/mol, x in A, m in amu
# -> time unit: 1 t* = sqrt(amu * A^2 / (kcal/mol)) = 48.888 fs
_FS_PER_TIMEUNIT = 48.8882
_KB = 0.001987204259  # kcal/(mol K)


@partial(jax.jit, static_argnames=("calc", "n_steps"))
def _langevin_run(coords, masses, move_mask, key, T, dt, gamma, calc, n_steps: int):
    """BAOAB Langevin integrator; returns (coords, velocities, key).

    Stateful calculators (GFN-FF variational EEQ) carry their warm-start
    state through the scan — two force calls per step makes the warm
    solve twice as valuable here as in FIRE (opt/fire.py)."""
    inv_m = 1.0 / masses[:, None]
    c1 = jnp.exp(-gamma * dt)
    c2 = jnp.sqrt((1.0 - c1 * c1) * _KB * T)

    efs, aux_init = efs_for(calc)
    aux0 = aux_init(coords)

    def step(carry, _):
        x, v, key, aux = carry
        _, f, aux = efs(x, aux)
        f = f * move_mask[:, None]
        v = v + 0.5 * dt * f * inv_m
        x = x + 0.5 * dt * v * move_mask[:, None]
        key, sub = jax.random.split(key)
        noise = jax.random.normal(sub, x.shape, x.dtype)
        v = c1 * v + c2 * jnp.sqrt(inv_m) * noise * move_mask[:, None]
        x = x + 0.5 * dt * v * move_mask[:, None]
        _, f, aux = efs(x, aux)
        f = f * move_mask[:, None]
        v = v + 0.5 * dt * f * inv_m
        return (x, v, key, aux), None

    (x, v, key, _), _ = jax.lax.scan(
        step, (coords, jnp.zeros_like(coords), key, aux0), None, length=n_steps
    )
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


# pressure conversion: 1 kcal/mol/A^3 in atm
_ATM_PER_KCAL_A3 = 6.947695e-21 / 1e-30 / 101325.0
_COMPRESSIBILITY_ATM = 4.6e-5  # ~liquid water, 1/atm (Berendsen kappa)


@partial(jax.jit, static_argnames=("n_steps", "n_mols"))
def _npt_berendsen_run(
    coords, masses, mol_id, key, T, P0, dt, gamma, tau_p, box0, top,
    n_steps: int, n_mols: int,
):
    """Langevin (BAOAB) + Berendsen barostat under cubic PBC.

    The instantaneous pressure uses the exact virial via autodiff: with
    E(s) = E_pbc(s * x, s * L), P_virial = -(dE/ds) / (3 V) at s = 1 — no
    hand-derived pair virial needed (reference: ASE NPTBerendsen phase,
    firecode/md/equilibration.py:93-277)."""
    from firecode_tpu.calculators.forcefield import ff_energy_pbc

    inv_m = 1.0 / masses[:, None]
    n_atoms = coords.shape[0]
    c1 = jnp.exp(-gamma * dt)
    c2 = jnp.sqrt((1.0 - c1 * c1) * _KB * T)

    def energy(x, box):
        return ff_energy_pbc(x, top, box)

    grad_x = jax.grad(energy, argnums=0)

    def scaled_energy(s, x, box):
        return energy(s * x, s * box)

    dE_ds = jax.grad(scaled_energy, argnums=0)

    def step(carry, _):
        # forces ride in the carry: the barostat only translates molecular
        # centers AFTER the closing force evaluation, but recomputing the
        # opening force would still double the dominant cost for the
        # unscaled-majority of the motion; the small COM shift between steps
        # is absorbed by the thermostat like any integrator noise
        x, v, f, box, key = carry
        v = v + 0.5 * dt * f * inv_m
        x = x + 0.5 * dt * v
        key, sub = jax.random.split(key)
        noise = jax.random.normal(sub, x.shape, x.dtype)
        v = c1 * v + c2 * jnp.sqrt(inv_m) * noise
        x = x + 0.5 * dt * v
        f = -grad_x(x, box)
        v = v + 0.5 * dt * f * inv_m

        # instantaneous pressure (kcal/mol/A^3 -> atm)
        vol = box**3
        kinetic2 = jnp.sum(masses[:, None] * v * v)  # 2 K
        p_virial = -dE_ds(jnp.asarray(1.0, x.dtype), x, box) / (3.0 * vol)
        p_atm = (kinetic2 / (3.0 * vol) + p_virial) * _ATM_PER_KCAL_A3

        # Berendsen cell scaling, clamped for stability. Only the molecular
        # CENTERS scale (rigid translation per molecule): scaling absolute
        # coordinates would compress every bond by mu each step and blow up
        # the bonded terms over a sustained pressure mismatch.
        mu = (1.0 - (dt / tau_p) * _COMPRESSIBILITY_ATM * (P0 - p_atm)) ** (1.0 / 3.0)
        mu = jnp.clip(mu, 0.98, 1.02)
        m_col = masses[:, None]
        com = jax.ops.segment_sum(m_col * x, mol_id, num_segments=n_mols)
        m_mol = jax.ops.segment_sum(m_col, mol_id, num_segments=n_mols)
        com = com / m_mol
        x = x + (mu - 1.0) * com[mol_id]
        return (x, v, f, box * mu, key), p_atm

    f0 = -grad_x(coords, box0)
    (x, v, f, box, key), p_hist = jax.lax.scan(
        step, (coords, jnp.zeros_like(coords), f0, box0, key), None, length=n_steps
    )
    return x, box, p_hist


def run_npt_equilibration(
    topology,
    atomnos: np.ndarray,
    coords: np.ndarray,
    box: float,
    T: float = 298.15,
    P_atm: float = 1.0,
    dt_fs: float = 0.5,
    n_steps: int = 1000,
    tau_p_fs: float = 200.0,
    seed: int = 0,
    mol_id: np.ndarray | None = None,
) -> tuple[np.ndarray, float, np.ndarray]:
    """NPT (Berendsen) equilibration of a periodic box.

    topology: an FFTopology (e.g. LiteFF(...).topology built on the solvated
    system's disjoint molecular graph). mol_id: int[N] molecule assignment
    for the barostat's center-of-mass scaling (derived from the bond table
    when omitted). Returns (coords, box, pressure trace).
    """
    if mol_id is None:
        import networkx as nx

        g = nx.Graph()
        g.add_nodes_from(range(len(atomnos)))
        bonds = np.asarray(topology.bonds)
        keep = np.asarray(topology.bond_k) > 0
        g.add_edges_from(map(tuple, bonds[keep]))
        mol_id = np.empty(len(atomnos), dtype=np.int32)
        for k, comp in enumerate(nx.connected_components(g)):
            mol_id[list(comp)] = k
    mol_id = np.asarray(mol_id, dtype=np.int32)
    n_mols = int(mol_id.max()) + 1

    masses = jnp.asarray(MASSES[np.asarray(atomnos)], dtype=jnp.float32)
    x, box_out, p_hist = _npt_berendsen_run(
        jnp.asarray(coords, jnp.float32),
        masses,
        jnp.asarray(mol_id),
        jax.random.PRNGKey(seed),
        jnp.asarray(T, jnp.float32),
        jnp.asarray(P_atm, jnp.float32),
        jnp.asarray(dt_fs / _FS_PER_TIMEUNIT, jnp.float32),
        jnp.asarray(0.1, jnp.float32),
        jnp.asarray(tau_p_fs / _FS_PER_TIMEUNIT, jnp.float32),
        jnp.asarray(box, jnp.float32),
        topology,
        n_steps,
        n_mols,
    )
    return (
        np.asarray(x, dtype=np.float64),
        float(box_out),
        np.asarray(p_hist, dtype=np.float64),
    )


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
    n_solute = getattr(embedder, "solute_atom_counts", {}).get(
        mol.filename, getattr(mol, "n_solute", mol.n_atoms)
    )

    # stage 0: minimize the packed box before any dynamics — fresh packings
    # carry clashes that blow up a 298 K trajectory immediately (reference
    # staged relaxation, firecode/md/equilibration.py:93-277)
    from firecode_tpu.opt import Constraints, optimize_batch

    embedder.log("    MD stage 0: pre-relaxation of the packed box")
    cons = None
    if n_solute < mol.n_atoms:
        cons = Constraints().freeze_atoms(list(range(n_solute)))
    relax = optimize_batch(
        calc, mol.coords[0][None].astype(np.float32), constraints=cons,
        fmax=1.0, max_steps=1500,
    )
    coords = np.asarray(relax.coords[0], dtype=np.float64)

    embedder.log("    MD stage 1: solvent-only NVT (solute frozen)")
    coords = run_md_equilibration(
        calc, mol.atomnos, coords, T=embedder.options.T, dt_fs=0.5,
        frozen_atoms=np.arange(n_solute) if n_solute < mol.n_atoms else None,
        n_steps=500,
    )
    embedder.log("    MD stage 2: full NVT")
    coords = run_md_equilibration(
        calc, mol.atomnos, coords, T=embedder.options.T, dt_fs=0.5, n_steps=500
    )
    if not np.all(np.abs(coords) < 1e4):
        embedder.warn(
            "--> WARNING: MD equilibration diverged; returning the relaxed box"
        )
        coords = np.asarray(relax.coords[0], dtype=np.float64)
        n_solute = mol.n_atoms  # skip the NPT stage on a diverged system

    if n_solute < mol.n_atoms:
        # solvated box: NPT (Berendsen) phase relaxes the density under PBC
        # (reference firecode/md/equilibration.py:93-277 NPT phase)
        from firecode_tpu.calculators.forcefield import LiteFF

        box = float(np.ptp(coords, axis=0).max()) + 2.0
        top = LiteFF(mol.atomnos, coords, graph=mol.graph).topology
        embedder.log(
            f"    MD stage 3: NPT Berendsen at {embedder.options.P or 1.0} atm "
            f"(box {box:.1f} A)"
        )
        coords, box, p_hist = run_npt_equilibration(
            top, mol.atomnos, coords, box, T=embedder.options.T,
            P_atm=embedder.options.P or 1.0, n_steps=500,
        )
        embedder.log(
            f"    NPT done: box {box:.1f} A, mean pressure "
            f"{float(p_hist[-100:].mean()):.0f} atm"
        )
        if not check_solvent_scramble(mol.coords[0][:n_solute], coords, n_solute):
            embedder.warn(
                "--> WARNING: solute may have scrambled during MD equilibration"
            )

    outname = f"{Path(filename).stem}_equilibrated.xyz"
    write_xyz(outname, symbols_from_atomnos(mol.atomnos), coords)
    return outname
