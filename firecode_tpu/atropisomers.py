"""Automated dihedral rotation TS search (atropisomer interconversion).

Capability parity with firecode/atropisomer_module.py:50-529: coarse relaxed
scans in both rotation directions, peak detection, fine re-scan around each
peak, saddle refinement of the peak geometries, and plots.

TPU-first: every scan point is a constrained batched relaxation; the coarse
scan drives the whole angle grid as ONE batch of independent constrained
optimizations (scan points started from the same geometry and restrained to
their target dihedral) followed by a sequential sweep refinement only around
the detected peaks.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from firecode_tpu.io.xyz import write_xyz
from firecode_tpu.pt import symbols_from_atomnos


def ase_dih_scan(
    calc,
    coords: np.ndarray,
    quadruplet,
    n_points: int = 36,
    direction: int = 1,
    fmax: float = 0.1,
    k_dihedral: float = 150.0,
):
    """Sequential relaxed dihedral scan; returns (angles, energies, frames)."""
    from firecode_tpu.opt import Constraints, optimize_batch
    from firecode_tpu.prune.oracle import np_dihedral

    quad = tuple(int(x) for x in quadruplet)
    x = np.asarray(coords, dtype=np.float64).copy()
    phi0 = np_dihedral(x[list(quad)])
    angles, frames = [], []
    step = direction * 360.0 / n_points
    for k in range(n_points + 1):
        phi = phi0 + k * step
        cons = Constraints().add_dihedral(quad, phi, k=k_dihedral)
        res = optimize_batch(calc, x, constraints=cons, fmax=fmax, max_steps=600)
        x = np.asarray(res.coords, dtype=np.float64)
        angles.append(phi)
        frames.append(x.copy())
    frames = np.stack(frames)
    # report the BARE surface energy at each scan point (the optimizer's
    # composed energy includes the restraint penalty)
    import jax.numpy as jnp

    energies = np.asarray(calc.energy(jnp.asarray(frames)), dtype=np.float64)
    return np.array(angles), energies, frames


def fine_rescan(
    calc,
    frame: np.ndarray,
    quadruplet,
    half_width: float = 10.0,
    step: float = 1.0,
    fmax: float = 0.1,
    k_dihedral: float = 150.0,
):
    """1-degree relaxed re-scan around a coarse peak (reference
    atropisomer_module.py: coarse 10-degree scan then refined re-scan).

    All fine scan points start from the SAME peak frame and relax under
    their own dihedral restraint — one batched device call, not a sweep.
    Returns (best_frame, best_angle, energies)."""
    from firecode_tpu.opt import optimize_batch
    from firecode_tpu.opt.constraints import per_lane_restraint_calc
    from firecode_tpu.prune.oracle import np_dihedral

    quad = tuple(int(x) for x in quadruplet)
    x = np.asarray(frame, dtype=np.float64)
    phi_peak = np_dihedral(x[list(quad)])
    offsets = np.arange(-half_width, half_width + step / 2, step)
    # ONE batched device program: every fine point is a lane with its own
    # dihedral target (per-lane restraints), instead of a loop of per-point
    # compiles + small device calls
    scan_calc = per_lane_restraint_calc(
        calc, "dihedral", quad, phi_peak + offsets, k=k_dihedral
    )
    start = np.broadcast_to(x, (len(offsets), *x.shape))
    res = optimize_batch(scan_calc, start, fmax=fmax, max_steps=400)
    frames = np.asarray(res.coords, dtype=np.float64)
    # rank by the BARE surface energy: the optimizer's composed energy
    # includes the dihedral restraint penalty, which is larger on steep
    # shoulders and could out-score the true barrier top
    import jax.numpy as jnp

    energies = np.asarray(calc.energy(jnp.asarray(frames)), dtype=np.float64)
    best = int(np.argmax(energies))
    return frames[best], float(phi_peak + offsets[best]), energies


def _find_peaks(energies: np.ndarray, min_height: float = 0.1) -> list[int]:
    rel = energies - energies.min()
    n = len(rel)
    return [
        i
        for i in range(1, n - 1)
        if rel[i - 1] < rel[i] >= rel[i + 1] and rel[i] > min_height
    ]


def ase_torsion_TSs(
    calc,
    atomnos: np.ndarray,
    coords: np.ndarray,
    quadruplet,
    n_points: int = 36,
    refine_saddle: bool = True,
    fine_scan: bool = True,
    title: str = "atropisomer",
    logfunction=None,
    plot: bool = True,
) -> list[dict]:
    """Find rotation TSs about a dihedral: coarse scans both ways, peak
    refinement, optional saddle optimization of each peak."""
    from firecode_tpu.opt.saddle import saddle_refine_batch

    log = logfunction or (lambda s: None)
    results = []

    all_scans = []
    for direction in (1, -1):
        angles, energies, frames = ase_dih_scan(
            calc, coords, quadruplet, n_points=n_points, direction=direction
        )
        all_scans.append((direction, angles, energies, frames))
        rel = energies - energies.min()
        for peak in _find_peaks(rel):
            results.append(
                {
                    "direction": direction,
                    "angle": float(angles[peak]),
                    "barrier": float(rel[peak]),
                    "coords": frames[peak],
                    "converged": False,
                }
            )

    if fine_scan and results:
        # 1-degree refined re-scan around each coarse (10-degree) peak before
        # the saddle optimization (reference atropisomer_module.py:277-302)
        for entry in results:
            frame, angle, fine_e = fine_rescan(
                calc, entry["coords"], quadruplet, half_width=3.0, step=1.0
            )
            entry["coords"] = frame
            entry["angle"] = angle

    if refine_saddle and results:
        # all peaks from both scan directions refine as ONE batched device
        # call (vmapped eigenvector following), not a per-peak host loop
        batch = saddle_refine_batch(
            calc,
            np.stack([entry["coords"] for entry in results]),
            fmax=0.05,
            max_steps=150,
        )
        for k, entry in enumerate(results):
            entry["coords"] = batch.coords[k]
            entry["converged"] = bool(batch.converged[k])
            entry["energy"] = float(batch.energies[k])
            log(
                f"    {title}: peak at {entry['angle']:.0f} deg "
                f"(barrier {entry['barrier']:.2f} kcal/mol) -> saddle "
                f"{'converged' if entry['converged'] else 'NOT converged'}"
            )

    # deduplicate TSs found from both directions (same geometry)
    unique = []
    for entry in sorted(results, key=lambda e: e.get("barrier", 0.0)):
        if not any(
            np.linalg.norm(entry["coords"] - u["coords"]) < 0.5 for u in unique
        ):
            unique.append(entry)

    atoms = symbols_from_atomnos(atomnos)
    for k, entry in enumerate(unique):
        write_xyz(f"{title}_TS_{k + 1}.xyz", atoms, entry["coords"])

    if plot:
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            plt.figure()
            for direction, angles, energies, _ in all_scans:
                rel = energies - energies.min()
                plt.plot(angles, rel, label=f"direction {direction:+d}")
            plt.xlabel("Dihedral (deg)")
            plt.ylabel("Rel. E (kcal/mol)")
            plt.legend()
            plt.savefig(f"{title}_torsion_scan.svg")
            plt.close()
        except Exception:
            pass

    return unique


def dihedral_scan(filename: str, embedder, quadruplet=None) -> str:
    """Operator-style entry: run torsion TS search on a molecule file."""
    mol = next(m for m in embedder.objects if m.filename == filename)
    calc = embedder.dispatcher.get_batch_calc(
        mol.atomnos, mol.coords[0], graph=mol.graph,
        charge=mol.charge, solvent=embedder.options.solvent,
    )
    if quadruplet is None:
        dihedrals = [c for c in mol.constraints if c.type_ == "D"]
        if not dihedrals:
            raise ValueError("dihedral_scan needs a D constraint line or quadruplet")
        quadruplet = dihedrals[0].indices
    stem = Path(filename).stem
    results = ase_torsion_TSs(
        calc, mol.atomnos, mol.coords[0], quadruplet,
        title=stem, logfunction=lambda s: embedder.log(s, p=False),
    )
    embedder.log(f"    Found {len(results)} distinct rotation TS(s)")
    return f"{stem}_TS_1.xyz" if results else filename
