"""Solvent-box building: packmol binary when present, native fallback kernel.

Capability parity with firecode/md/packmol.py:17-359 (box size and solvent
count from density + solvation shells). When the packmol binary is absent, a
native random-packing + batched clash-relaxation kernel builds the box on
device (the option suggested in SURVEY.md section 2.2 packmol row).
"""

from __future__ import annotations

import os
import subprocess
import tempfile
from pathlib import Path
from shutil import which

import numpy as np

from firecode_tpu.io.xyz import read_xyz, write_xyz
from firecode_tpu.solvents import normalize_solvent, physical_data
from firecode_tpu.units import AVOGADRO

# minimal built-in solvent geometries (Angstrom)
_SOLVENT_GEOMETRIES: dict[str, tuple[list[str], np.ndarray]] = {
    "water": (
        ["O", "H", "H"],
        np.array([[0.0, 0.0, 0.0], [0.9572, 0.0, 0.0], [-0.24, 0.927, 0.0]]),
    ),
    "acetonitrile": (
        ["C", "C", "N", "H", "H", "H"],
        np.array(
            [
                [0.0, 0.0, 0.0],
                [1.46, 0.0, 0.0],
                [2.62, 0.0, 0.0],
                [-0.37, 1.03, 0.0],
                [-0.37, -0.51, 0.89],
                [-0.37, -0.51, -0.89],
            ]
        ),
    ),
    "dcm": (
        ["C", "Cl", "Cl", "H", "H"],
        np.array(
            [
                [0.0, 0.0, 0.0],
                [1.40, 1.10, 0.0],
                [-1.40, 1.10, 0.0],
                [0.0, -0.65, 0.90],
                [0.0, -0.65, -0.90],
            ]
        ),
    ),
}


def compute_box(solute_coords: np.ndarray, solvent: str, shells: float = 2.0):
    """Box edge (A) and number of solvent molecules from density."""
    extent = np.ptp(solute_coords, axis=0).max()
    edge = extent + 2 * shells * 3.5  # ~3.5 A per solvation shell
    mw, density = physical_data[normalize_solvent(solvent)]
    vol_ml = (edge**3) * 1e-24
    n_solvent = int(density * vol_ml / mw * AVOGADRO)
    return float(edge), max(n_solvent, 1)


def solvate_molecule(filename: str, embedder, shells: float = 2.0) -> str:
    solvent = embedder.options.solvent or "water"
    canonical = normalize_solvent(solvent)
    if canonical not in _SOLVENT_GEOMETRIES:
        raise ValueError(
            f"No built-in geometry for solvent {solvent!r}; "
            f"available: {sorted(_SOLVENT_GEOMETRIES)}"
        )
    mol = next(m for m in embedder.objects if m.filename == filename)
    edge, n_solvent = compute_box(mol.coords[0], canonical, shells)
    # record the solute atom count so equilibrate> can freeze the solute and
    # trigger the NPT stage after the operator chain replaces the molecule
    if not hasattr(embedder, "solute_atom_counts"):
        embedder.solute_atom_counts = {}
    embedder.solute_atom_counts[f"{Path(filename).stem}_solvated.xyz"] = mol.n_atoms
    embedder.log(
        f"    Solvating {mol.basename} with {n_solvent} {canonical} molecules "
        f"(box edge {edge:.1f} A)"
    )

    packmol = os.environ.get("FIRECODE_TPU_PACKMOL_PATH", "packmol")
    if which(packmol) is not None:
        return _run_packmol(mol, canonical, edge, n_solvent, packmol, embedder)
    embedder.log("    packmol binary not found: using native packing kernel")
    return _native_pack(mol, canonical, edge, n_solvent, embedder)


def _run_packmol(mol, solvent, edge, n_solvent, packmol, embedder) -> str:
    syms, geom = _SOLVENT_GEOMETRIES[solvent]
    with tempfile.TemporaryDirectory(prefix="fc_packmol_") as tmp:
        tmpdir = Path(tmp)
        write_xyz(tmpdir / "solute.xyz", mol.atoms, mol.coords[0])
        write_xyz(tmpdir / "solvent.xyz", syms, geom)
        inp = f"""tolerance 2.0
filetype xyz
output packed.xyz
structure solute.xyz
  number 1
  center
  fixed {edge / 2} {edge / 2} {edge / 2} 0. 0. 0.
end structure
structure solvent.xyz
  number {n_solvent}
  inside box 0. 0. 0. {edge} {edge} {edge}
end structure
"""
        (tmpdir / "pack.inp").write_text(inp)
        with open(tmpdir / "pack.inp") as f:
            result = subprocess.run(
                [packmol], stdin=f, cwd=tmpdir, capture_output=True, text=True
            )
        if result.returncode != 0 or not (tmpdir / "packed.xyz").exists():
            raise RuntimeError(f"packmol failed:\n{result.stdout[-2000:]}")
        atoms, coords, _ = read_xyz(tmpdir / "packed.xyz")
        outname = f"{Path(mol.filename).stem}_solvated.xyz"
        write_xyz(outname, atoms, coords)
        return outname


def _native_pack(mol, solvent, edge, n_solvent, embedder, seed: int = 0) -> str:
    """Random placement + batched clash relaxation with the LiteFF LJ term."""
    from firecode_tpu.calculators import LiteFF
    from firecode_tpu.graphs import get_sum_graph, graphize
    from firecode_tpu.opt import Constraints, optimize_batch
    from firecode_tpu.pt import atomnos_from_symbols

    syms, geom = _SOLVENT_GEOMETRIES[solvent]
    solvent_z = atomnos_from_symbols(syms)
    rng = np.random.default_rng(seed)

    solute = mol.coords[0] - mol.coords[0].mean(axis=0) + edge / 2
    frames = [solute]
    atomnos = [mol.atomnos]
    graphs = [mol.graph]
    for _ in range(n_solvent):
        # random rotation + position
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        w, x, y, z = q
        rot = np.array(
            [
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
            ]
        )
        pos = rng.uniform(2.0, edge - 2.0, size=3)
        frames.append((geom - geom.mean(axis=0)) @ rot.T + pos)
        atomnos.append(solvent_z)
        graphs.append(graphize(solvent_z, geom))

    coords = np.concatenate(frames)
    all_z = np.concatenate(atomnos)
    graph = get_sum_graph(graphs)
    calc = LiteFF(all_z, coords, graph=graph)
    cons = Constraints().freeze_atoms(range(mol.n_atoms))
    res = optimize_batch(calc, coords.astype(np.float32), constraints=cons,
                         fmax=1.0, max_steps=500)
    packed = np.asarray(res.coords, dtype=np.float64)

    from firecode_tpu.pt import symbols_from_atomnos

    outname = f"{Path(mol.filename).stem}_solvated.xyz"
    write_xyz(outname, symbols_from_atomnos(all_z), packed)
    embedder.log(f"    Native packing wrote {outname} ({len(all_z)} atoms)")
    return outname
