"""pKa workflow: conformational search + refinement + qRRHO free energies for
the neutral and deprotonated/protonated species.

Capability parity with firecode/pka.py:41-303: the reactive index decides the
process (H at the index -> acid, deprotonate; otherwise base, protonate along
the mean-neighbor vector); Delta-G values are stored on the molecule and the
embedder prints pKa vs the reference compound at termination
(firecode/embedder.py:2887-2955).
"""

from __future__ import annotations

import numpy as np

from firecode_tpu.errors import InputError
from firecode_tpu.graphs import graphize


def _best_free_energy(embedder, atomnos, coords, charge) -> float:
    """Optimize a small ensemble and return the best G (kcal/mol)."""
    from firecode_tpu.opt import optimize_batch
    from firecode_tpu.prune import prune_by_rmsd
    from firecode_tpu.thermo import get_free_energies

    calc = embedder.dispatcher.get_batch_calc(
        atomnos, coords[0], charge=charge, solvent=embedder.options.solvent
    )
    res = optimize_batch(calc, coords, fmax=0.05, max_steps=2000)
    opt = np.asarray(res.coords, dtype=np.float64)
    energies = np.asarray(res.energy, dtype=np.float64)
    order = np.argsort(energies)
    opt, energies = opt[order], energies[order]
    keep = prune_by_rmsd(opt, atomnos, energies=energies)
    opt = opt[keep][:5]  # keep the few best conformers for thermo
    gs = get_free_energies(
        calc, atomnos, opt, T=embedder.options.T, P=embedder.options.P,
        C=embedder.options.C,
    )
    return float(np.min(gs))


def deprotonate(atomnos, coords, index: int):
    """Remove the H at `index` (or the H bonded to the atom at `index`)."""
    graph = graphize(atomnos, coords)
    if atomnos[index] == 1:
        h_id = index
    else:
        hs = [n for n in graph.neighbors(index) if atomnos[n] == 1]
        if not hs:
            raise InputError(f"No H to remove at/near index {index}")
        h_id = hs[0]
    mask = np.ones(len(atomnos), dtype=bool)
    mask[h_id] = False
    return atomnos[mask], coords[mask]


def protonate(atomnos, coords, index: int, d_nh: float = 1.04):
    """Add an H along the negated mean-neighbor vector
    (firecode/pka.py:143-156)."""
    graph = graphize(atomnos, coords)
    nbrs = list(graph.neighbors(index))
    if nbrs:
        vecs = coords[nbrs] - coords[index]
        vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        direction = -np.mean(vecs, axis=0)
        direction /= max(np.linalg.norm(direction), 1e-9)
    else:
        direction = np.array([0.0, 0.0, 1.0])
    new_h = coords[index] + d_nh * direction
    return (
        np.concatenate([atomnos, [1]]).astype(atomnos.dtype),
        np.concatenate([coords, new_h[None]]),
    )


def pka_routine(filename: str, embedder) -> None:
    mol = next(m for m in embedder.objects if m.filename == filename)
    if len(mol.reactive_indices) != 1:
        raise InputError("pka> needs exactly one reactive index on the molecule")
    index = int(mol.reactive_indices[0])

    graph = mol.graph
    is_acid = mol.atomnos[index] == 1 or any(
        mol.atomnos[n] == 1 for n in graph.neighbors(index)
    )

    embedder.log(
        f"    pKa routine on {mol.basename}: index {index} -> "
        f"{'acid (HA -> A-)' if is_acid else 'base (B -> BH+)'}"
    )

    g_neutral = _best_free_energy(embedder, mol.atomnos, mol.coords, mol.charge)

    if is_acid:
        z2, c2 = deprotonate(mol.atomnos, mol.coords[0], index)
        g_other = _best_free_energy(embedder, z2, c2[None], mol.charge - 1)
        dg = g_other - g_neutral
        mol.pka_data = ("HA -> A-", float(dg))
    else:
        z2, c2 = protonate(mol.atomnos, mol.coords[0], index)
        g_other = _best_free_energy(embedder, z2, c2[None], mol.charge + 1)
        dg = g_neutral - g_other
        mol.pka_data = ("B -> BH+", float(dg))

    embedder.log(f"    {mol.pka_data[0]}: dG = {mol.pka_data[1]:.2f} kcal/mol")
