"""Host interface to ORCA GOAT global conformer search.

Capability parity with firecode/interfaces/goat.py:32-415: the full ORCA
input is generated natively — method keyword mapping (GFN2-XTB -> XTB2,
GFN-FF -> GFNFF, dual-level -> XTB2 + GFNUPHILL GFNFF), ALPB solvation on
the simple-keyword line, %pal/%maxcore resource blocks, the %goat block
(MAXEN energy window, ALIGN, GFNUPHILL for dual level, AUTOWALL for NCI
mode), and %geom Constraints with ORCA's {B/A/D i j .. value|C} syntax
(0-based indices; C = constrain to current value).

ORCA is proprietary and cannot be reimplemented; when absent,
MissingExternalError points at the native csearch> operator
(SURVEY.md section 2.2 GOAT row).
"""

from __future__ import annotations

import os
import subprocess
from pathlib import Path
from shutil import which

import numpy as np

from firecode_tpu.errors import MissingExternalError
from firecode_tpu.io.xyz import read_xyz, write_xyz
from firecode_tpu.solvents import get_xtb_solvent_name


def _orca_method_keyword(method: str) -> str:
    m = method.upper()
    return {
        "GFN2-XTB": "XTB2", "GFN2": "XTB2",
        "GFN-FF": "GFNFF", "GFNFF": "GFNFF",
        "GFN1-XTB": "XTB1", "GFN1": "XTB1",
    }.get(m, m)


def build_goat_input(
    atoms,
    coords: np.ndarray,
    method: str = "GFN2-XTB",
    solvent: str | None = None,
    charge: int = 0,
    multiplicity: int = 1,
    kcal: float = 10.0,
    ncimode: bool = False,
    procs: int | None = None,
    maxcore_mb: int | None = None,
    constrained_indices=None,
    constrained_distances=None,
    constrained_angles_indices=None,
    constrained_angles_values=None,
    constrained_dihedrals_indices=None,
    constrained_dihedrals_values=None,
) -> str:
    """Full ORCA GOAT ``.inp`` text (see module docstring for the dialect)."""
    dual_level = method.upper() in ("GFN2-XTB//GFN-FF", "GFN2//GFNFF")
    keyword = "XTB2" if dual_level else _orca_method_keyword(method)

    simple = ["!", keyword, "GOAT"]
    if solvent is not None:
        simple.append(f"ALPB({get_xtb_solvent_name(solvent)})")
    lines = [" ".join(simple), ""]

    procs = procs if procs is not None else (os.cpu_count() or 1)
    if procs > 1:
        lines += ["%pal", f"  nprocs {procs}", "end", ""]
    if maxcore_mb is not None:
        lines += [f"%maxcore {int(maxcore_mb)}", ""]

    lines.append("%goat")
    lines.append(f"  MAXEN {kcal}")
    lines.append("  ALIGN true")
    if dual_level:
        lines.append("  GFNUPHILL GFNFF")
    if ncimode:
        lines.append("  AUTOWALL true")
    lines += ["end", ""]

    def norm(x):
        return list(x) if x else []

    pairs = norm(constrained_indices)
    dists = norm(constrained_distances) or [None] * len(pairs)
    angles = norm(constrained_angles_indices)
    angle_vals = norm(constrained_angles_values) or [None] * len(angles)
    dihedrals = norm(constrained_dihedrals_indices)
    dih_vals = norm(constrained_dihedrals_values) or [None] * len(dihedrals)

    if pairs or angles or dihedrals:
        lines += ["%geom", "  Constraints"]
        for (i, j), d in zip(pairs, dists):
            val = "C" if d is None else f"{round(float(d), 4)}"
            lines.append(f"    {{B {int(i)} {int(j)} {val}}}")
        for (a, b, c), v in zip(angles, angle_vals):
            val = "C" if v is None else f"{round(float(v), 4)}"
            lines.append(f"    {{A {int(a)} {int(b)} {int(c)} {val}}}")
        for (a, b, c, d), v in zip(dihedrals, dih_vals):
            val = "C" if v is None else f"{round(float(v), 4)}"
            lines.append(f"    {{D {int(a)} {int(b)} {int(c)} {int(d)} {val}}}")
        lines += ["  end", "end", ""]

    lines.append(f"* xyz {charge} {multiplicity}")
    for element, (x, y, z) in zip(atoms, np.asarray(coords)):
        lines.append(f"  {element:<3s} {x:15.8f} {y:15.8f} {z:15.8f}")
    lines += ["*", ""]
    return "\n".join(lines)


def run_goat(
    atoms,
    coords: np.ndarray,
    workdir: Path,
    title: str = "goat_run",
    **kwargs,
) -> np.ndarray:
    """Write the input, run ORCA, read <title>.finalensemble.xyz."""
    orca = os.environ.get("FIRECODE_TPU_ORCA_PATH") or os.environ.get("ORCAEXE", "orca")
    if which(orca) is None:
        raise MissingExternalError(
            "orca binary not found: goat> needs an ORCA install. The native "
            "csearch> operator covers systematic conformer generation."
        )
    workdir.mkdir(parents=True, exist_ok=True)
    (workdir / f"{title}.inp").write_text(build_goat_input(atoms, coords, **kwargs))
    with open(workdir / f"{title}.out", "w") as f:
        result = subprocess.run(
            [orca, f"{title}.inp"], cwd=workdir, stdout=f, stderr=subprocess.STDOUT
        )
    if result.returncode != 0:
        tail = (workdir / f"{title}.out").read_text()[-2000:]
        raise RuntimeError(f"orca/goat failed:\n{tail}")
    ens = workdir / f"{title}.finalensemble.xyz"
    if not ens.exists():
        raise RuntimeError("GOAT produced no final ensemble file")
    _, out_coords, _ = read_xyz(ens)
    return out_coords


def goat_search(filename: str, embedder) -> str:
    """The goat> operator: GOAT run on the best conformer + native post-prune."""
    orca = os.environ.get("FIRECODE_TPU_ORCA_PATH") or os.environ.get("ORCAEXE", "orca")
    if which(orca) is None:
        raise MissingExternalError(
            "orca binary not found: goat> needs an ORCA install. The native "
            "csearch> operator covers systematic conformer generation."
        )
    mol = next(m for m in embedder.objects if m.filename == filename)
    mol_id = embedder.objects.index(mol)
    constraints = [
        tgt
        for _, tgt in embedder.pairings_dict[mol_id].items()
        if isinstance(tgt, tuple)
    ]
    distances = [
        embedder.get_pairing_dists_from_constrained_indices(tuple(p))
        for p in constraints
    ]
    base = Path(filename).stem
    coords = run_goat(
        mol.atoms,
        mol.coords[0],
        Path(f"{base}_GOAT"),
        title=base,
        method=embedder.options.crestlevel or "GFN2-XTB",
        solvent=embedder.options.solvent,
        charge=mol.charge,
        multiplicity=mol.mult,
        kcal=embedder.options.kcal_thresh or 10.0,
        ncimode=embedder.options.nci,
        constrained_indices=constraints,
        constrained_distances=distances,
    )
    # native device post-prune of the GOAT ensemble (reference goat.py:242-415
    # delegates to prism_pruner's prune)
    from firecode_tpu.prune import prune_by_rmsd

    before = len(coords)
    keep = prune_by_rmsd(coords, mol.atomnos, rmsd_thr=embedder.options.rmsd)
    coords = coords[keep]
    embedder.log(
        f"    GOAT produced {before} conformers; {len(coords)} after RMSD prune"
    )
    outname = f"{base}_goat_confs.xyz"
    write_xyz(outname, mol.atoms, coords)
    return outname
