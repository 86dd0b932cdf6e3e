"""pKa workflow: conformational search + refinement + qRRHO free energies for
the neutral and deprotonated/protonated species.

Capability parity with firecode/pka.py:41-303: the reactive index decides the
process (H at the index -> acid, deprotonate; otherwise base, protonate along
the mean-neighbor vector); Delta-G values are stored on the molecule and the
embedder prints pKa vs the reference compound at termination
(firecode/embedder.py:2887-2955).

Calculator guidance: pKa is computed RELATIVE to a reference compound, so
systematic offsets cancel. At the CALC=GFNFF tier the ions are evaluated
with the site-constrained EEQ (GFNFFTopology.site_b: the net charge is
softly confined to the reacting functional group, killing the
molecule-size charge-delocalization artifact that inflated round-3's
within-class deltas severalfold) — the ion class deltas are anchored in
fixtures.ION_DIAGNOSTICS / ACCURACY.json to a few kcal/mol. CALC=XTB
(external hatch) and MLIPs remain available, like the reference's ase
calculators (firecode/pka.py).
"""

from __future__ import annotations

import numpy as np

from firecode_tpu.errors import InputError
from firecode_tpu.graphs import graphize


def _best_free_energy(
    embedder, atomnos, coords, charge, charge_site=None, site_target=None
) -> float:
    """Optimize a small ensemble and return the best G (kcal/mol)."""
    from firecode_tpu.opt import optimize_batch
    from firecode_tpu.prune import prune_by_rmsd
    from firecode_tpu.thermo import get_free_energies

    calc = embedder.dispatcher.get_batch_calc(
        atomnos, coords[0], charge=charge, solvent=embedder.options.solvent,
        charge_site=charge_site, site_charge_target=site_target,
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


def get_anions(atomnos, conformers, index: int):
    """All deprotonation candidates: every H on (or at) the reactive index,
    removed from EVERY input conformer (reference firecode/pka.py:41-91
    _get_anions). Removing H's at different positions leaves different
    element ORDERINGS, so candidates are grouped by their resulting atomnos
    sequence (plus the shifted heavy-site index): returns a list of
    (anion_atomnos, coords [n, N-1, 3], site_idx, removed_h_indices)
    groups, each internally consistent for batching; site_idx is the
    deprotonated heavy atom in the ANION numbering (the charge-constraint
    site for the GFNFF tier)."""
    conformers = np.asarray(conformers).reshape(-1, len(atomnos), 3)
    graph = graphize(atomnos, conformers[0])
    if atomnos[index] == 1:
        h_ids = [index]
    else:
        h_ids = [n for n in graph.neighbors(index) if atomnos[n] == 1]
    if not h_ids:
        raise InputError(f"No H to remove at/near index {index}")
    heavy = index if atomnos[index] != 1 else next(
        n for n in graph.neighbors(index) if atomnos[n] != 1
    )
    groups: dict[tuple, list] = {}
    z_by_key: dict[tuple, np.ndarray] = {}
    h_by_key: dict[tuple, list] = {}
    for h in h_ids:
        mask = np.ones(len(atomnos), dtype=bool)
        mask[h] = False
        z_h = atomnos[mask]
        heavy_new = heavy - (1 if h < heavy else 0)
        # the shifted heavy-site index is part of the grouping key: frames
        # in one batch share one topology, so they must share the site
        key = (heavy_new, *(int(z) for z in z_h))
        z_by_key[key] = z_h
        h_by_key[key] = h_by_key.get(key, []) + [h]
        groups.setdefault(key, []).append(conformers[:, mask])
    return [
        (z_by_key[key], np.concatenate(frames), key[0], h_by_key[key])
        for key, frames in groups.items()
    ]


def get_cations(atomnos, conformers, index: int, d_xh: float = 1.04):
    """All protonation candidates: the mean-neighbor-vector placement applied
    to every conformer, plus tetrahedral alternatives when the site has
    exactly two neighbors (both lone-pair lobes of an sp3 O/N) — reference
    firecode/pka.py:92-158 _get_cations."""
    conformers = np.asarray(conformers).reshape(-1, len(atomnos), 3)
    frames = []
    for coords in conformers:
        graph = graphize(atomnos, coords)
        nbrs = list(graph.neighbors(index))
        directions = []
        if nbrs:
            vecs = coords[nbrs] - coords[index]
            vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
            mean = -np.mean(vecs, axis=0)
            norm = np.linalg.norm(mean)
            if norm > 1e-6:
                directions.append(mean / norm)
            if len(nbrs) == 2:
                # sp3-like site: both out-of-plane lone-pair lobes
                normal = np.cross(vecs[0], vecs[1])
                n_norm = np.linalg.norm(normal)
                if n_norm > 1e-6 and norm > 1e-6:
                    normal /= n_norm
                    base = mean / norm
                    for sign in (1.0, -1.0):
                        lobe = base + sign * normal
                        lobe /= np.linalg.norm(lobe)
                        directions.append(lobe)
        if not directions:
            directions = [np.array([0.0, 0.0, 1.0])]
        for d in directions:
            new_h = coords[index] + d_xh * d
            frames.append(np.concatenate([coords, new_h[None]]))
    z_out = np.concatenate([atomnos, [1]]).astype(atomnos.dtype)
    return z_out, np.stack(frames)


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

    # reference semantics (firecode/pka.py:235): an H AT the reactive index
    # means acid (remove that proton); any heavy atom means base (protonate
    # it) — an amine N with H neighbors is a BASE, not an acid
    is_acid = mol.atomnos[index] == 1

    embedder.log(
        f"    pKa routine on {mol.basename}: index {index} -> "
        f"{'acid (HA -> A-)' if is_acid else 'base (B -> BH+)'}"
    )

    g_neutral = _best_free_energy(embedder, mol.atomnos, mol.coords, mol.charge)

    # site-constrained charge transfer for the GFNFF tier: the neutral
    # parent's EEQ group charge sets the ion's site target so net-charge
    # delocalization cannot scale with molecule size (the round-3 ddep
    # pathology; see GFNFFTopology.site_b). Other calculators ignore sites.
    q0 = None
    if str(embedder.dispatcher.calculator).startswith("GFNFF"):
        from firecode_tpu.calculators.gfnff import GFNFF

        q0 = GFNFF(
            mol.atomnos, mol.coords[0], charge=mol.charge
        ).charges(mol.coords[0])

    if is_acid:
        # all removable H's on the site x all conformers; one batched refine
        # per element-ordering group, best G across groups
        g_other = min(
            _best_free_energy(
                embedder, z2, c2, mol.charge - 1,
                charge_site=None if q0 is None else [site_idx],
                site_target=None if q0 is None else float(
                    q0[site_idx + (1 if removed[0] <= site_idx else 0)]
                    + np.mean([q0[h] for h in removed]) - 1.0
                ),
            )
            for z2, c2, site_idx, removed in get_anions(
                mol.atomnos, mol.coords, index
            )
        )
        dg = g_other - g_neutral
        mol.pka_data = ("HA -> A-", float(dg))
    else:
        # mean-vector + lone-pair-lobe placements x all conformers
        z2, c2 = get_cations(mol.atomnos, mol.coords, index)
        g_other = _best_free_energy(
            embedder, z2, c2, mol.charge + 1,
            charge_site=None if q0 is None else [index, len(z2) - 1],
            site_target=None if q0 is None else float(q0[index] + 1.0),
        )
        # reference convention (firecode/pka.py:300): store G(BH+) - G(B);
        # the termination's base formula (dG_ref - dG) assumes it. Storing
        # the negation silently flipped base pKa deltas around the
        # reference value (methylamine came out BELOW ammonia).
        dg = g_other - g_neutral
        mol.pka_data = ("B -> BH+", float(dg))

    embedder.log(f"    {mol.pka_data[0]}: dG = {mol.pka_data[1]:.2f} kcal/mol")
