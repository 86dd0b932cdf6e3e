"""Host interface to ORCA GOAT global conformer search.

Capability parity with firecode/interfaces/goat.py:32-415. ORCA is proprietary
and cannot be reimplemented; when absent, MissingExternalError points at the
native csearch>. Capability overlap note: SURVEY.md section 2.2 GOAT row.
"""

from __future__ import annotations

import os
import subprocess
import tempfile
from pathlib import Path
from shutil import which

from firecode_tpu.errors import MissingExternalError
from firecode_tpu.io.xyz import read_xyz, write_xyz


def goat_search(filename: str, embedder) -> str:
    orca = os.environ.get("FIRECODE_TPU_ORCA_PATH", "orca")
    if which(orca) is None:
        raise MissingExternalError(
            "orca binary not found: goat> needs an ORCA install. The native "
            "csearch> operator covers systematic conformer generation."
        )
    mol = next(m for m in embedder.objects if m.filename == filename)
    with tempfile.TemporaryDirectory(prefix="fc_goat_") as tmp:
        tmpdir = Path(tmp)
        write_xyz(tmpdir / "in.xyz", mol.atoms, mol.coords[0])
        inp = [
            "! XTB2 GOAT",
            f"%pal nprocs {os.cpu_count() or 1} end",
            f"* xyzfile {mol.charge} {mol.mult} in.xyz",
        ]
        (tmpdir / "goat.inp").write_text("\n".join(inp) + "\n")
        result = subprocess.run(
            [orca, "goat.inp"], cwd=tmpdir, capture_output=True, text=True
        )
        if result.returncode != 0:
            raise RuntimeError(f"orca/goat failed:\n{result.stdout[-2000:]}")
        ens = tmpdir / "goat.finalensemble.xyz"
        if not ens.exists():
            raise RuntimeError("GOAT produced no final ensemble file")
        atoms, coords, _ = read_xyz(ens)
        outname = f"{Path(filename).stem}_goat_confs.xyz"
        write_xyz(outname, atoms, coords)
        return outname
