"""Host interface to the external CREST binary (metadynamics conformer search).

Capability parity with firecode/interfaces/crest.py:17-457: both input
dialects are generated natively —

- CREST 2 legacy ``.inp``: ``$constrain`` blocks (distance/angle/dihedral,
  ``auto`` targets), a ``$metadyn`` active-atom list with consecutive-range
  compression, and the full command-line flag set (--gfn2//gfnff dual level,
  --alpb/--gbsa solvation, --ewin, --nci, --noreftopo, --norestart);
- CREST 3 TOML: top-level input/runtype/topo/threads, single or dual
  ``[[calculation.level]]`` blocks (GFN-FF driving the dynamics via
  ``[dynamics] active = [1]``), typed ``[[calculation.constraint]]`` blocks,
  and ``[cregen] ewin``.

The operator pipeline around the binary lives in run_crest_search:
batched constrained pre-optimization of the input conformers (ONE device
call — the reference loops conformer-by-conformer, firecode/operators.py:
466-520), a per-conformer metadynamics run with automatic GFN2 retry when
the dual-level run crashes (reference operators.py:566-587), and the
MOI -> RMSD -> rotamer-corrected post-prune of the merged ensemble
(reference operators.py:607-631). Batched metadynamics itself is out of
native scope (SURVEY.md section 2.2); the native alternative is csearch>.
"""

from __future__ import annotations

import os
import re
import subprocess
from pathlib import Path
from shutil import which

import numpy as np

from firecode_tpu.errors import FatalError, InputError, MissingExternalError
from firecode_tpu.io.xyz import read_xyz, write_xyz
from firecode_tpu.solvents import get_xtb_solvent_name


def _crest_path() -> str:
    path = os.environ.get("FIRECODE_TPU_CREST_PATH", "crest")
    if which(path) is None:
        raise MissingExternalError(
            "crest binary not found. Install CREST or use the native csearch> "
            "operator (batched torsion-driven search on device) instead."
        )
    return path


def crest_version() -> int | None:
    """Major version of the installed crest binary (2 or 3), None if absent."""
    path = os.environ.get("FIRECODE_TPU_CREST_PATH", "crest")
    if which(path) is None:
        return None
    try:
        out = subprocess.run(
            [path, "--version"], capture_output=True, text=True, timeout=30
        ).stdout
    except (OSError, subprocess.TimeoutExpired):
        return None
    m = re.search(r"[Vv]ersion\s+(\d+)", out)
    return int(m.group(1)) if m else 2


def compress_ranges(ids: list[int]) -> str:
    """1-based id list -> compact range string: [1,2,3,5,7,8] -> '1-3,5,7-8'."""
    if not ids:
        return ""
    parts: list[str] = []
    start = prev = ids[0]
    for i in ids[1:] + [None]:
        if i is not None and i == prev + 1:
            prev = i
            continue
        parts.append(str(start) if start == prev else f"{start}-{prev}")
        if i is not None:
            start = prev = i
    return ",".join(parts)


def _norm(seq):
    return list(seq) if seq else []


def build_crest2_input(
    n_atoms: int,
    constrained_indices=None,
    constrained_distances=None,
    constrained_angles_indices=None,
    constrained_angles_values=None,
    constrained_dihedrals_indices=None,
    constrained_dihedrals_values=None,
) -> str:
    """Legacy CREST 2 ``.inp`` text: $constrain + $metadyn active-atom ranges."""
    pairs = _norm(constrained_indices)
    dists = _norm(constrained_distances) or [None] * len(pairs)
    angles = _norm(constrained_angles_indices)
    angle_vals = _norm(constrained_angles_values) or [None] * len(angles)
    dihedrals = _norm(constrained_dihedrals_indices)
    dih_vals = _norm(constrained_dihedrals_values) or [None] * len(dihedrals)

    lines = ["$opt"]
    if pairs or angles or dihedrals:
        lines.append("$constrain")
        for (i1, i2), d in zip(pairs, dists):
            target = "auto" if d is None else f"{float(d):.3f}"
            lines.append(f"   distance: {i1 + 1}, {i2 + 1}, {target}")
        for (a, b, c), v in zip(angles, angle_vals):
            target = "auto" if v is None else f"{float(v):.3f}"
            lines.append(f"   angle: {a + 1}, {b + 1}, {c + 1}, {target}")
        for (a, b, c, d), v in zip(dihedrals, dih_vals):
            target = "auto" if v is None else f"{float(v):.3f}"
            lines.append(f"   dihedral: {a + 1}, {b + 1}, {c + 1}, {d + 1}, {target}")

    frozen: set[int] = set()
    for block in (pairs, angles, dihedrals):
        for tup in block:
            frozen.update(int(x) for x in tup)
    active = [i + 1 for i in range(n_atoms) if i not in frozen]
    lines.append("$metadyn")
    lines.append(f"   atoms: {compress_ranges(active)}")
    lines.append("$end")
    return "\n".join(lines) + "\n"


def crest2_flags(
    method: str = "GFN2-XTB//GFN-FF",
    charge: int = 0,
    solvent: str | None = None,
    kcal: float | None = None,
    ncimode: bool = False,
    procs: int | None = None,
    threads: int | None = None,
) -> list[str]:
    """Command-line flag list for a CREST 2 run (after the xyz and --cinp)."""
    flags = ["--norestart"]
    m = method.upper()
    if m in ("GFN-FF", "GFNFF"):
        flags.append("--gfnff")
    elif m in ("GFN2-XTB", "GFN2"):
        flags.append("--gfn2")
    elif m in ("GFN2-XTB//GFN-FF", "GFN2//GFNFF"):
        flags.append("--gfn2//gfnff")
    if charge != 0:
        flags += ["--chrg", str(charge)]
    if procs is not None:
        flags += ["-P", str(procs)]
    if threads is not None:
        flags += ["-T", str(threads)]
    if solvent is not None:
        if solvent.lower() == "methanol":
            flags += ["--gbsa", "methanol"]  # ALPB has no methanol
        else:
            flags += ["--alpb", get_xtb_solvent_name(solvent)]
    flags += ["--ewin", str(10 if kcal is None else kcal)]
    if ncimode:
        flags.append("--nci")
    flags.append("--noreftopo")
    return flags


def build_crest3_toml(
    title: str,
    method: str = "GFN2-XTB//GFN-FF",
    charge: int = 0,
    solvent: str | None = None,
    kcal: float | None = None,
    ncimode: bool = False,
    threads: int = 1,
    constrained_indices=None,
    constrained_distances=None,
    constrained_angles_indices=None,
    constrained_angles_values=None,
    constrained_dihedrals_indices=None,
    constrained_dihedrals_values=None,
) -> str:
    """CREST 3 TOML input text (input/runtype/levels/constraints/cregen)."""
    lines = [
        f"# CREST 3 input file - {title}",
        f"input = '{title}.xyz'",
        f"runtype = '{'nci-mtd' if ncimode else 'imtd-gc'}'",
        "topo = false",
        f"threads = {threads}",
        "",
    ]

    def method_key(m: str) -> str:
        m = m.upper()
        return {
            "GFN-FF": "gfnff", "GFNFF": "gfnff",
            "GFN2-XTB": "gfn2", "GFN2": "gfn2",
            "GFN1-XTB": "gfn1", "GFN1": "gfn1",
        }.get(m, m.lower())

    def level_block(key: str) -> list[str]:
        blk = ["[[calculation.level]]", f"method = '{key}'"]
        if charge != 0:
            blk.append(f"chrg = {charge}")
        if solvent is not None:
            if solvent.lower() == "methanol":
                blk.append("gbsa = 'methanol'")
            else:
                blk.append(f"alpb = '{get_xtb_solvent_name(solvent)}'")
        return blk

    if method.upper() in ("GFN2-XTB//GFN-FF", "GFN2//GFNFF"):
        # GFN-FF drives the metadynamics, GFN2 the optimizations
        lines += level_block("gfnff") + [""]
        lines += level_block("gfn2") + [""]
        lines += ["[dynamics]", "active = [1]", ""]
    else:
        lines += level_block(method_key(method)) + [""]

    def constraint_block(type_: str, atoms: tuple, val) -> list[str]:
        blk = [
            "[[calculation.constraint]]",
            f"type = '{type_}'",
            "atoms = [" + ", ".join(str(int(a) + 1) for a in atoms) + "]",
        ]
        if val is not None:
            blk.append(f"val = {round(float(val), 3)}")
        return blk + [""]

    pairs = _norm(constrained_indices)
    dists = _norm(constrained_distances) or [None] * len(pairs)
    for pair, d in zip(pairs, dists):
        lines += constraint_block("bond", tuple(pair), d)
    angles = _norm(constrained_angles_indices)
    angle_vals = _norm(constrained_angles_values) or [None] * len(angles)
    for tri, v in zip(angles, angle_vals):
        lines += constraint_block("angle", tuple(tri), v)
    dihedrals = _norm(constrained_dihedrals_indices)
    dih_vals = _norm(constrained_dihedrals_values) or [None] * len(dihedrals)
    for quad, v in zip(dihedrals, dih_vals):
        lines += constraint_block("dihedral", tuple(quad), v)

    lines += ["[cregen]", f"ewin = {10 if kcal is None else kcal}", ""]
    return "\n".join(lines)


def run_crest_mtd(
    atoms,
    coords: np.ndarray,
    workdir: Path,
    title: str = "crest_run",
    version: int | None = None,
    method: str = "GFN2-XTB//GFN-FF",
    charge: int = 0,
    solvent: str | None = None,
    kcal: float | None = None,
    ncimode: bool = False,
    threads: int = 4,
    **constraint_kwargs,
) -> np.ndarray:
    """One metadynamics run on one conformer; returns the ensemble [M, N, 3].

    Raises subprocess.CalledProcessError on a crest failure so callers can
    implement the GFN2 retry (see run_crest_search)."""
    crest = _crest_path()
    if version is None:
        version = crest_version() or 2
    workdir.mkdir(parents=True, exist_ok=True)
    write_xyz(workdir / f"{title}.xyz", atoms, coords, title=title)

    if version >= 3:
        (workdir / f"{title}.toml").write_text(
            build_crest3_toml(
                title, method=method, charge=charge, solvent=solvent, kcal=kcal,
                ncimode=ncimode, threads=threads, **constraint_kwargs,
            )
        )
        cmd = [crest, f"{title}.toml", "--noreftopo"]
    else:
        (workdir / f"{title}.inp").write_text(
            build_crest2_input(len(atoms), **constraint_kwargs)
        )
        cmd = [crest, f"{title}.xyz", "--cinp", f"{title}.inp"] + crest2_flags(
            method=method, charge=charge, solvent=solvent, kcal=kcal,
            ncimode=ncimode, threads=threads,
        )

    with open(workdir / f"{title}.out", "w") as f:
        subprocess.run(cmd, cwd=workdir, stdout=f, stderr=subprocess.STDOUT, check=True)
    ens = workdir / "crest_conformers.xyz"
    if not ens.exists():
        raise subprocess.CalledProcessError(1, cmd, "no crest_conformers.xyz")
    _, out_coords, _ = read_xyz(ens)
    return out_coords


def run_crest_search(filename: str, embedder) -> str:
    """The crest> operator pipeline: preopt -> MTD (with GFN2 retry) -> prune."""
    import time

    mol = next(m for m in embedder.objects if m.filename == filename)
    if len(mol.coords) > 20 and not embedder.options.let:
        raise InputError(
            "The crest> operator was given more than 20 input conformers: this "
            "would run that many metadynamic searches. Add LET to override."
        )
    version = crest_version()
    if version is None:
        raise MissingExternalError(
            "crest binary not found. Install CREST or use the native csearch> "
            "operator (batched torsion-driven search on device) instead."
        )
    log = embedder.log
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

    # batched constrained pre-optimization: the WHOLE conformer ensemble in
    # one device call (the reference optimizes one conformer at a time)
    if embedder.options.optimization:
        from firecode_tpu.graphs import molecule_check_batch
        from firecode_tpu.opt import Constraints, optimize_batch

        log(
            f"--> {filename}: batched geometry optimization pre-crest "
            f"({embedder.options.theory_level} via {embedder.options.calculator}, "
            f"{len(constraints)} constraints)"
        )
        calc = embedder.dispatcher.get_batch_calc(
            mol.atomnos, mol.coords[0], graph=mol.graph, charge=mol.charge,
            solvent=embedder.options.solvent,
        )
        cons = Constraints()
        for (i1, i2), d in zip(constraints, distances):
            target = d if d is not None else float(
                np.linalg.norm(mol.coords[0][i1] - mol.coords[0][i2])
            )
            cons.add_distance(i1, i2, target, k=500.0)
        result = optimize_batch(
            calc, mol.coords.astype(np.float32), constraints=cons, fmax=0.05,
            max_steps=4000,
        )
        new_coords = np.asarray(result.coords, dtype=np.float64)
        ok = molecule_check_batch(mol.atomnos, mol.coords, new_coords)
        for c in np.nonzero(~ok)[0]:
            dump = f"{Path(filename).stem}_conf{c + 1}_SCRAMBLED.xyz"
            write_xyz(dump, mol.atoms, new_coords[c])
            log(f"    Conformer {c + 1} scrambled during pre-optimization -> {dump}")
        if not ok.all():
            raise FatalError(filename)
        mol.coords = new_coords
        from firecode_tpu.graphs import graphize

        mol.graph = graphize(mol.atomnos, mol.coords[0])
        embedder.graphs = [m.graph for m in embedder.objects]

    method = embedder.options.crestlevel or "GFN2-XTB//GFN-FF"
    log(
        f"--> Performing {method} metadynamic search on {filename} via CREST "
        f"v{version}" + (" (NCI mode)" if embedder.options.nci else "")
    )

    t0 = time.perf_counter()
    all_confs: list[np.ndarray] = []
    base = Path(filename).stem
    for i, coords in enumerate(mol.coords):
        workdir = Path(f"{base}_CREST_{i + 1}")
        kwargs = dict(
            method=method, charge=mol.charge, solvent=embedder.options.solvent,
            kcal=embedder.options.kcal_thresh, ncimode=embedder.options.nci,
            constrained_indices=constraints, constrained_distances=distances,
        )
        try:
            batch = run_crest_mtd(
                mol.atoms, coords, workdir, title=base, version=version, **kwargs
            )
        except subprocess.CalledProcessError:
            # dual-level run crashed: retry at plain GFN2 (slower, stabler) —
            # reference failure-recovery semantics (operators.py:566-587)
            log(
                "    Metadynamics failed with GFN2-XTB//GFN-FF, retrying with "
                "plain GFN2-XTB"
            )
            kwargs["method"] = "GFN2-XTB"
            batch = run_crest_mtd(
                mol.atoms, coords, workdir, title=base, version=version, **kwargs
            )
        all_confs.append(batch)
        log(f"    Conformer {i + 1}/{len(mol.coords)}: {len(batch)} structures")

    merged = np.concatenate(all_confs).reshape(-1, len(mol.atoms), 3)
    before = len(merged)
    log(
        f"    CREST generated {before} conformers in "
        f"{time.perf_counter() - t0:.1f} s"
    )

    # MOI -> RMSD -> rotamer-corrected post-prune (reference operators.py:
    # 607-631), all on device through the native cascade
    from firecode_tpu.prune import prune_by_moi, prune_by_rmsd, prune_by_rmsd_rot_corr

    keep = prune_by_moi(merged, mol.atomnos)
    merged = merged[keep]
    if len(merged) < 5e4:
        keep = prune_by_rmsd(merged, mol.atomnos, rmsd_thr=embedder.options.rmsd)
        merged = merged[keep]
    if len(merged) < 1e3:
        keep = prune_by_rmsd_rot_corr(
            merged, mol.atomnos, rmsd_thr=embedder.options.rmsd
        )
        merged = merged[keep]
    log(f"    Discarded {before - len(merged)} similar structures ({len(merged)} left)")

    outname = f"{base}_crest_confs.xyz"
    write_xyz(outname, mol.atoms, merged)
    return outname


# backward-compatible alias (pre-round-2 name)
def crest_mtd_search(filename: str, embedder) -> str:
    return run_crest_search(filename, embedder)
