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


def translate_constraints_by_smarts(
    atomnos: np.ndarray, coords: np.ndarray, smarts: str, local_indices
) -> list[tuple[int, ...]]:
    """Map constraint indices defined on a SMARTS pattern onto the molecule
    (firecode/rdkit_tools.py:403-449)."""
    matches = smarts_match(atomnos, coords, smarts)
    return [tuple(m[i] for i in local_indices) for m in matches]
