"""RDKit-backed helpers: ETKDG conformer generation, SMILES -> 3D, SMARTS
substructure matching.

Capability parity with firecode/rdkit_tools.py:48-449. RDKit is an optional
host-side dependency (SURVEY.md section 2.2 rdkit row: "keep as host-side CPU
dependency (pre-processing layer)"); every entry point degrades to a
MissingExternalError with a pointer to the native alternative when rdkit is
not installed.
"""

from __future__ import annotations

import numpy as np

from firecode_tpu.errors import MissingExternalError


def _require_rdkit():
    try:
        from rdkit import Chem  # noqa: F401
        from rdkit.Chem import AllChem  # noqa: F401

        return Chem, AllChem
    except ImportError as exc:
        raise MissingExternalError(
            "rdkit is not installed. SMILES/SMARTS features need it; conformer "
            "generation is also available natively via the csearch> operator."
        ) from exc


def smiles_to_3d(
    smiles: str, n_confs: int = 1, seed: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """SMILES -> (atomnos, coords [B, N, 3]) via ETKDGv3 embedding."""
    Chem, AllChem = _require_rdkit()
    mol = Chem.MolFromSmiles(smiles)
    if mol is None:
        raise ValueError(f"Could not parse SMILES {smiles!r}")
    mol = Chem.AddHs(mol)
    params = AllChem.ETKDGv3()
    params.randomSeed = seed
    params.pruneRmsThresh = 0.5
    AllChem.EmbedMultipleConfs(mol, numConfs=n_confs, params=params)
    AllChem.MMFFOptimizeMoleculeConfs(mol)
    atomnos = np.array([a.GetAtomicNum() for a in mol.GetAtoms()], dtype=np.int32)
    coords = np.stack(
        [conf.GetPositions() for conf in mol.GetConformers()]
    )
    return atomnos, coords


def etkdg_conformers(
    atomnos: np.ndarray, coords: np.ndarray, n_confs: int = 100, seed: int = 0
) -> np.ndarray:
    """ETKDG conformers for an existing 3D molecule (bond perception from
    geometry) — firecode/rdkit_tools.py:48-124."""
    Chem, AllChem = _require_rdkit()
    from rdkit.Chem import rdDetermineBonds

    from firecode_tpu.io.xyz import format_xyz
    from firecode_tpu.pt import symbols_from_atomnos

    xyz_block = format_xyz(symbols_from_atomnos(atomnos), coords)
    mol = Chem.MolFromXYZBlock(xyz_block)
    rdDetermineBonds.DetermineBonds(mol)
    params = AllChem.ETKDGv3()
    params.randomSeed = seed
    params.pruneRmsThresh = 0.5
    AllChem.EmbedMultipleConfs(mol, numConfs=n_confs, params=params)
    return np.stack([c.GetPositions() for c in mol.GetConformers()])


def smarts_match(
    atomnos: np.ndarray, coords: np.ndarray, smarts: str
) -> list[tuple[int, ...]]:
    """Indices of substructure matches (firecode/rdkit_tools.py:127-402)."""
    Chem, _ = _require_rdkit()
    from rdkit.Chem import rdDetermineBonds

    from firecode_tpu.io.xyz import format_xyz
    from firecode_tpu.pt import symbols_from_atomnos

    mol = Chem.MolFromXYZBlock(format_xyz(symbols_from_atomnos(atomnos), coords))
    rdDetermineBonds.DetermineBonds(mol)
    patt = Chem.MolFromSmarts(smarts)
    if patt is None:
        raise ValueError(f"Could not parse SMARTS {smarts!r}")
    return [tuple(m) for m in mol.GetSubstructMatches(patt)]


# --------------------------------------------------------------------------
# symmetry-equivalent atom disambiguation (firecode/rdkit_tools.py:127-402).
# The environment fingerprint runs on the NATIVE molecular graph (graphize +
# BFS layers), so symmetry detection needs no rdkit at all — only the SMARTS
# substructure matching itself does.
# --------------------------------------------------------------------------


def atom_environment_fingerprint(graph, atomnos: np.ndarray, idx: int, depth: int = 4) -> tuple:
    """Canonical fingerprint of an atom's chemical environment: its (Z,
    degree) plus sorted (Z, degree) multisets of each BFS shell out to
    `depth` bonds. Two atoms with equal fingerprints are symmetry-equivalent
    for constraint purposes."""
    atomnos = np.asarray(atomnos)
    fp: list = [(int(atomnos[idx]), graph.degree[idx])]
    visited = {idx}
    layer = {idx}
    for _ in range(depth):
        nxt = set()
        for a in layer:
            for b in graph.neighbors(a):
                if b not in visited:
                    nxt.add(b)
                    visited.add(b)
        if not nxt:
            break
        fp.append(tuple(sorted((int(atomnos[b]), graph.degree[b]) for b in nxt)))
        layer = nxt
    return tuple(fp)


def find_symmetric_positions(
    atomnos: np.ndarray, coords: np.ndarray, match, graph=None, depth: int = 4
) -> list[list[int]]:
    """Groups of positions WITHIN `match` whose atoms are symmetry-equivalent
    (same element + same graph environment) — e.g. the two oxygens of a
    carboxylate, the three hydrogens of a methyl group."""
    from firecode_tpu.graphs import graphize

    atomnos = np.asarray(atomnos)
    if graph is None:
        graph = graphize(atomnos, np.asarray(coords))
    groups: dict = {}
    for pos, atom_idx in enumerate(match):
        key = atom_environment_fingerprint(graph, atomnos, int(atom_idx), depth)
        groups.setdefault(key, []).append(pos)
    return [g for g in groups.values() if len(g) > 1]


def expand_symmetric_matches(
    match: tuple, symmetric_groups: list[list[int]]
) -> list[tuple]:
    """All index tuples reachable by permuting symmetry-equivalent positions."""
    from itertools import permutations

    versions = {tuple(match)}
    for group in symmetric_groups:
        new = set()
        for m in versions:
            vals = [m[i] for i in group]
            for perm in permutations(vals):
                out = list(m)
                for i, v in zip(group, perm):
                    out[i] = v
                new.add(tuple(out))
        versions |= new
    return sorted(versions)


def match_smarts_with_symmetry(
    atomnos: np.ndarray,
    coords: np.ndarray,
    smarts: str,
    symmetric_atoms: list[list[int]] | None = None,
    auto_symmetry: bool = True,
    single_match_expected: bool = False,
) -> list[list[tuple[int, ...]]]:
    """SMARTS matching with symmetric-permutation expansion.

    Multi-fragment patterns ('frag1.frag2') match independently and combine
    over disjoint atom sets. For each base match, every permutation of
    symmetry-equivalent atoms (auto-detected via the native environment
    fingerprint, plus any manually declared groups) is returned, so a
    constraint defined on one arbitrary match ordering applies to all
    chemically identical variants (firecode/rdkit_tools.py:236-402)."""
    from itertools import product

    fragments = [p.strip() for p in smarts.split(".")]
    per_fragment = []
    for pattern in fragments:
        matches = smarts_match(atomnos, coords, pattern)
        if not matches:
            raise ValueError(f"No matches for SMARTS fragment {pattern!r}")
        per_fragment.append(matches)

    base_matches = []
    for combo in product(*per_fragment):
        flat = sum(combo, ())
        if len(set(flat)) == len(flat):  # no atom used twice across fragments
            base_matches.append(flat)
    if not base_matches:
        raise ValueError(f"No disjoint matches for SMARTS {smarts!r}")
    if single_match_expected and len(base_matches) != 1:
        raise ValueError(
            f"Expected a single SMARTS match, found {len(base_matches)}"
        )

    results = []
    for match in base_matches:
        groups = list(symmetric_atoms or [])
        if auto_symmetry:
            for g in find_symmetric_positions(atomnos, coords, match):
                if g not in groups:
                    groups.append(g)
        results.append(expand_symmetric_matches(match, groups))
    return results


def translate_constraints_by_smarts(
    atomnos: np.ndarray,
    coords: np.ndarray,
    smarts: str,
    local_indices,
    symmetric: bool = True,
) -> list[tuple[int, ...]]:
    """Map constraint indices defined on a SMARTS pattern onto the molecule
    (firecode/rdkit_tools.py:403-449). With symmetric=True, constraints are
    emitted for every symmetry-equivalent variant of each match."""
    if not symmetric:
        matches = smarts_match(atomnos, coords, smarts)
        return [tuple(m[i] for i in local_indices) for m in matches]
    out = []
    for variants in match_smarts_with_symmetry(atomnos, coords, smarts):
        for m in variants:
            tup = tuple(m[i] for i in local_indices)
            if tup not in out:
                out.append(tup)
    return out
