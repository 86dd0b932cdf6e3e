"""Workflow operators ("verbs" applied to molecule files before the embed).

Capability parity with the reference dispatcher (firecode/operators.py:62-131)
and the operator plugin contract (reference paper.md:86-112): each operator is
f(filename, embedder) -> outname; `operate` dispatches on the operator name.

Native operators (csearch/opt/neb/scan/saddle/freq/pka) run on the batched
device engines. External-engine operators (crest/mtd, goat, packmol) call the
host interfaces in firecode_tpu.interfaces and raise MissingExternalError with
an actionable message when the binary is not installed.
"""

from __future__ import annotations

import os
import time
from pathlib import Path

import numpy as np

from firecode_tpu.errors import InputError, MissingExternalError
from firecode_tpu.io.xyz import write_xyz


# user-registered operators (plugin contract, reference paper.md:86-112):
# each operator is f(filename, embedder) -> outname
_CUSTOM_OPERATORS: dict[str, object] = {}


def register_operator(name: str, func) -> None:
    """Register a custom operator usable as `name>` in input files."""
    _CUSTOM_OPERATORS[name.lower()] = func


def operate(filename: str, operator: str, embedder) -> str | None:
    """Dispatch an operator string like 'csearch' or 'scan(5.0)'."""
    op_name = operator.split("(")[0].strip().lower()
    table = {
        # native conformer searches (reference names + short aliases)
        "csearch": csearch_operator,
        "firecode_search": csearch_operator,
        "csearch_hb": csearch_hb_operator,
        "firecode_search_hb": csearch_hb_operator,
        "rsearch": rsearch_operator,
        "firecode_rsearch": rsearch_operator,
        "confab": csearch_operator,
        # refinement / TS / thermo
        "opt": opt_operator,
        "refine": refine_operator,
        "neb": neb_operator,
        "fsm": fsm_operator,
        "mlfsm": fsm_operator,
        "scan": scan_operator,
        "saddle": saddle_operator,
        "ts": saddle_operator,
        "freq": freq_operator,
        "thermo": freq_operator,
        "pka": pka_operator,
        "entropy": entropy_operator,
        "confanal": entropy_operator,
        "population": entropy_operator,
        # native batched metadynamics / global optimizer / genetic
        # crossing (no binary needed)
        "mtd_native": mtd_native_operator,
        "goat_native": goat_native_operator,
        "gc_native": gc_native_operator,
        # external engines (gated)
        "mtd": crest_operator,
        "mtd_search": crest_operator,
        "crest": crest_operator,
        "crest_search": crest_operator,
        "goat": goat_operator,
        "rdkit": rdkit_search_operator,
        "rdkit_search": rdkit_search_operator,
        "racerts": rdkit_search_operator,
        "racerts_search": rdkit_search_operator,
        "packmol": packmol_operator,
        "solvate": packmol_operator,
        "equilibrate": equilibrate_operator,
    }
    func = _CUSTOM_OPERATORS.get(op_name) or table.get(op_name)
    if func is None:
        raise InputError(
            f"Operator '{op_name}' not recognized. "
            f"Known: {sorted(set(table) | set(_CUSTOM_OPERATORS))}"
        )
    # parenthesized key=value arguments are routed to operators that declare
    # a matching parameter, e.g. "mtd_native(walkers=16,steps=5000)>";
    # bare/positional tokens are ignored for reference-input compatibility
    kw = {}
    if "(" in operator:
        import inspect

        params = inspect.signature(func).parameters
        inner = operator.split("(", 1)[1].rstrip(")").strip()
        for tok in filter(None, (t.strip() for t in inner.split(","))):
            if "=" not in tok:
                continue
            k, v = (s.strip() for s in tok.split("=", 1))
            k = k.lower()
            if k in params:
                kw[k] = _coerce(v)
            else:
                embedder.log(
                    f"--> NOTE: {op_name}> ignoring unknown argument '{k}'"
                )
    t0 = time.perf_counter()
    embedder.log(f"--> Running {op_name}> operator on {filename}")
    out = func(filename, embedder, **kw)
    embedder.log(
        f"--> {op_name}> operator on {filename} completed "
        f"({time.perf_counter() - t0:.1f} s)\n"
    )
    return out


def _coerce(v: str):
    """Operator-argument literal: int, float, bool, or bare string."""
    low = v.lower()
    if low in ("true", "false"):
        return low == "true"
    for cast in (int, float):
        try:
            return cast(v)
        except ValueError:
            continue
    return v


def _mol_for(filename: str, embedder):
    for mol in embedder.objects:
        if mol.filename == filename:
            return mol
    raise InputError(f"Molecule {filename} not found among input files")


def _internal_constraints_for(filename: str, embedder) -> list[tuple[int, int]]:
    mol_id = next(
        i for i, mol in enumerate(embedder.objects) if mol.filename == filename
    )
    out = []
    for _, tgt in embedder.pairings_dict[mol_id].items():
        if isinstance(tgt, tuple):
            out.append(tgt)
    return out


def _get_calc(embedder, mol):
    return embedder.dispatcher.get_batch_calc(
        mol.atomnos, mol.coords[0], graph=mol.graph, charge=mol.charge,
        solvent=embedder.options.solvent,
    )


def _constraints_object(mol, pairs, embedder, spring_k: float = 500.0):
    from firecode_tpu.opt import Constraints

    cons = Constraints()
    for i1, i2 in pairs:
        d = float(np.linalg.norm(mol.coords[0][i1] - mol.coords[0][i2]))
        cons.add_distance(int(i1), int(i2), d, k=spring_k)
    for c in mol.constraints:
        if c.type_ == "B":
            cons.add_distance(c.indices[0], c.indices[1], c.value, k=spring_k)
        elif c.type_ == "A":
            cons.add_angle(*c.indices, c.value)
        else:
            cons.add_dihedral(c.indices, c.value)
    return cons if (pairs or mol.constraints) else None


# ------------------------------------------------------------ native ops


def csearch_operator(filename: str, embedder, keep_hb: bool = False) -> str:
    """Torsion-driven conformational search (firecode/operators.py:134-192)."""
    from firecode_tpu.csearch import csearch

    mol = _mol_for(filename, embedder)
    constrained = _internal_constraints_for(filename, embedder)
    confs = csearch(
        mol.atomnos,
        mol.coords[0],
        constrained_indices=constrained,
        keep_hb=keep_hb or embedder.options.keep_hb,
        n_out=embedder.options.max_confs,
        logfunction=lambda s: embedder.log(s, p=False),
    )

    if embedder.options.ff_opt and embedder.options.optimization:
        calc = _get_calc(embedder, mol)
        cons = _constraints_object(mol, constrained, embedder)
        from firecode_tpu.opt import optimize_batch

        res = optimize_batch(calc, confs, constraints=cons, fmax=0.05, max_steps=3000)
        confs = np.asarray(res.coords, dtype=np.float64)
        energies = np.asarray(res.energy, dtype=np.float64)
        order = np.argsort(energies)
        confs, energies = confs[order], energies[order]
        from firecode_tpu.prune import prune_by_rmsd

        keep = prune_by_rmsd(confs, mol.atomnos, rmsd_thr=embedder.options.rmsd,
                             energies=energies)
        confs, energies = confs[keep], energies[keep]
    else:
        energies = None

    outname = f"{Path(filename).stem}_confs.xyz"
    write_xyz(outname, mol.atoms, confs, energies=None, title=Path(filename).stem)
    embedder.log(f"    Wrote {len(confs)} conformers to {outname}")
    return outname


def csearch_hb_operator(filename: str, embedder) -> str:
    return csearch_operator(filename, embedder, keep_hb=True)


def mtd_native_operator(
    filename: str,
    embedder,
    walkers: int = 8,
    steps: int = 3000,
    dep_every: int = 150,
    k_push: float = 3.0,
    alpha: float = 0.6,
    temperature: float = 500.0,
    gc: bool = False,
) -> str:
    """Native batched RMSD metadynamics conformer search (mtd_native>).

    The reference outsources metadynamics to the CREST binary
    (firecode/interfaces/crest.py:444); here W biased walkers run as one
    batched device program (md/metadynamics.py), and the deposited
    snapshots go through the standard optimize -> energy-sort -> cascade
    refinement. A capability the per-process CPU reference cannot express.
    gc=1 appends genetic torsion crossing on the refined pool (md/gc.py) —
    CREST's full iMTD-GC composition, natively."""
    from firecode_tpu.md.metadynamics import run_mtd
    from firecode_tpu.opt import optimize_batch
    from firecode_tpu.prune import prune_by_moi, prune_by_rmsd

    mol = _mol_for(filename, embedder)
    calc = _get_calc(embedder, mol)
    embedder.log(f"--> mtd_native> batched metadynamics on {filename}")
    pool = run_mtd(
        calc, mol.atomnos, mol.coords[0],
        n_walkers=int(walkers), n_steps=int(steps), dep_every=int(dep_every),
        k_push=float(k_push), alpha=float(alpha),
        temperature=float(temperature), mesh=embedder.device_mesh,
    )
    embedder.log(f"    {len(pool)} biased snapshots from {int(walkers)} walkers")

    constrained = _internal_constraints_for(filename, embedder)
    cons = _constraints_object(mol, constrained, embedder)
    res = optimize_batch(
        calc, pool, constraints=cons, fmax=0.05, max_steps=3000,
        mesh=embedder.device_mesh,
    )
    confs = np.asarray(res.coords, dtype=np.float64)[np.asarray(res.converged)]
    energies = np.asarray(res.energy, dtype=np.float64)[np.asarray(res.converged)]
    order = np.argsort(energies)
    confs, energies = confs[order], energies[order]
    if len(confs):
        keep = prune_by_moi(confs, mol.atomnos, energies=energies)
        confs, energies = confs[keep], energies[keep]
        keep = prune_by_rmsd(
            confs, mol.atomnos, rmsd_thr=embedder.options.rmsd, energies=energies
        )
        confs, energies = confs[keep], energies[keep]
    if gc and len(confs) >= 2:
        from firecode_tpu.md.gc import run_gc

        confs, energies, n_new = run_gc(
            calc, mol.atomnos, confs, energies,
            rmsd_thr=embedder.options.rmsd, constraints=cons,
            mesh=embedder.device_mesh,
        )
        embedder.log(f"    GC stage: {n_new} surviving crossed conformers")
    n_out = min(len(confs), embedder.options.max_confs)
    confs, energies = confs[:n_out], energies[:n_out]

    outname = f"{Path(filename).stem}_mtd.xyz"
    from firecode_tpu.units import KCAL_TO_EH

    # write_xyz labels frame energies in Eh — convert the relative kcal/mol
    rel_eh = (energies - energies.min()) * KCAL_TO_EH if len(confs) else None
    write_xyz(outname, mol.atoms, confs, energies=rel_eh, title=Path(filename).stem)
    embedder.log(f"    Wrote {len(confs)} conformers to {outname}")
    return outname


def goat_native_operator(
    filename: str,
    embedder,
    walkers: int = 8,
    rounds: int = 6,
    uphill_steps: int = 1000,
    dep_every: int = 100,
    k_push: float = 4.0,
    alpha: float = 0.7,
    temperature: float = 700.0,
    maxen: float = 6.0,
    gc: bool = False,
) -> str:
    """Native batched GOAT-style global conformer optimization (goat_native>).

    The reference reaches global optimization only through the proprietary
    ORCA GOAT binary (firecode/interfaces/goat.py:32); here the uphill/
    downhill cycle runs natively: biased walkers pre-seeded with the whole
    known pool (md/goat.py), batched FIRE downhill, MAXEN window + cascade
    dedup, until the pool goes stale. maxen is the retained energy window
    in kcal/mol (ORCA %goat MAXEN)."""
    from firecode_tpu.md.goat import run_goat

    mol = _mol_for(filename, embedder)
    calc = _get_calc(embedder, mol)
    constrained = _internal_constraints_for(filename, embedder)
    cons = _constraints_object(mol, constrained, embedder)
    embedder.log(f"--> goat_native> batched global optimization on {filename}")
    res = run_goat(
        calc, mol.atomnos, mol.coords,
        n_walkers=int(walkers), max_rounds=int(rounds),
        uphill_steps=int(uphill_steps), dep_every=int(dep_every),
        k_push=float(k_push), alpha=float(alpha),
        temperature=float(temperature), maxen=float(maxen),
        rmsd_thr=embedder.options.rmsd, constraints=cons, gc=bool(gc),
        mesh=embedder.device_mesh,
    )
    tag = "converged (stale pool)" if res.converged else "round limit reached"
    embedder.log(
        f"    pool of {len(res.energies)} conformers after "
        f"{res.rounds} uphill/downhill rounds — {tag}"
    )

    n_out = min(len(res.energies), embedder.options.max_confs)
    confs, energies = res.coords[:n_out], res.energies[:n_out]
    outname = f"{Path(filename).stem}_goat.xyz"
    from firecode_tpu.units import KCAL_TO_EH

    rel_eh = (energies - energies.min()) * KCAL_TO_EH if len(confs) else None
    write_xyz(outname, mol.atoms, confs, energies=rel_eh, title=Path(filename).stem)
    embedder.log(f"    Wrote {len(confs)} conformers to {outname}")
    return outname


def gc_native_operator(
    filename: str,
    embedder,
    maxen: float = 6.0,
    max_children: int = 256,
    min_turn: float = 30.0,
    gens: int = 3,
) -> str:
    """Native batched genetic torsion crossing (gc_native>).

    The reference reaches genetic crossing only through the CREST binary's
    iMTD-GC workflow (firecode/interfaces/crest.py:444); here the input
    ensemble is optimized, then every parent pair is crossed in torsion
    space (md/gc.py), the children optimized as one batched FIRE program,
    and the merged pool cascade-deduplicated — repeated for up to `gens`
    generations or until the pool stops growing."""
    from firecode_tpu.md.gc import run_gc
    from firecode_tpu.opt import optimize_batch

    mol = _mol_for(filename, embedder)
    calc = _get_calc(embedder, mol)
    constrained = _internal_constraints_for(filename, embedder)
    cons = _constraints_object(mol, constrained, embedder)
    embedder.log(f"--> gc_native> genetic torsion crossing on {filename}")

    res = optimize_batch(
        calc, mol.coords, constraints=cons, fmax=0.05, max_steps=3000,
        mesh=embedder.device_mesh,
    )
    ok = np.asarray(res.converged)
    pool_c = np.asarray(res.coords, dtype=np.float64)[ok]
    pool_e = np.asarray(res.energy, dtype=np.float64)[ok]
    if len(pool_c) == 0:
        raise InputError(
            f"gc_native> {filename}: no input conformer optimized to "
            "convergence"
        )
    order = np.argsort(pool_e, kind="stable")
    pool_c, pool_e = pool_c[order], pool_e[order]

    pool_c, pool_e, n_new = run_gc(
        calc, mol.atomnos, pool_c, pool_e,
        maxen=float(maxen), rmsd_thr=embedder.options.rmsd,
        max_children=int(max_children), min_turn=float(min_turn),
        max_gens=int(gens), constraints=cons, mesh=embedder.device_mesh,
    )
    embedder.log(
        f"    {n_new} new conformers from crossing — pool of {len(pool_e)}"
    )

    n_out = min(len(pool_e), embedder.options.max_confs)
    confs, energies = pool_c[:n_out], pool_e[:n_out]
    outname = f"{Path(filename).stem}_gc.xyz"
    from firecode_tpu.units import KCAL_TO_EH

    rel_eh = (energies - energies.min()) * KCAL_TO_EH if len(confs) else None
    write_xyz(outname, mol.atoms, confs, energies=rel_eh, title=Path(filename).stem)
    embedder.log(f"    Wrote {len(confs)} conformers to {outname}")
    return outname


def rsearch_operator(filename: str, embedder) -> str:
    """Random-mode torsion search."""
    from firecode_tpu.csearch import csearch

    mol = _mol_for(filename, embedder)
    confs = csearch(
        mol.atomnos, mol.coords[0], mode=2, n_out=embedder.options.max_confs,
        constrained_indices=_internal_constraints_for(filename, embedder),
        logfunction=lambda s: embedder.log(s, p=False),
    )
    outname = f"{Path(filename).stem}_confs.xyz"
    write_xyz(outname, mol.atoms, confs)
    return outname


def opt_operator(filename: str, embedder) -> str:
    """Batched ensemble refinement (firecode/operators.py:195-267)."""
    from firecode_tpu.opt import optimize_batch
    from firecode_tpu.prune import prune_by_rmsd

    mol = _mol_for(filename, embedder)
    calc = _get_calc(embedder, mol)
    pairs = _internal_constraints_for(filename, embedder)
    cons = _constraints_object(mol, pairs, embedder)

    res = optimize_batch(calc, mol.coords, constraints=cons, fmax=0.05, max_steps=2000)
    coords = np.asarray(res.coords, dtype=np.float64)
    energies = np.asarray(res.energy, dtype=np.float64)
    converged = np.asarray(res.converged)
    coords, energies = coords[converged], energies[converged]
    order = np.argsort(energies)
    coords, energies = coords[order], energies[order]

    rel = energies - energies.min() if len(energies) else energies
    keep_e = rel < embedder.options.kcal_thresh
    coords, energies = coords[keep_e], energies[keep_e]
    keep = prune_by_rmsd(coords, mol.atomnos, rmsd_thr=embedder.options.rmsd,
                         energies=energies)
    coords, energies = coords[keep], energies[keep]

    outname = f"{Path(filename).stem}_opt.xyz"
    write_xyz(outname, mol.atoms, coords, title=Path(filename).stem)
    embedder.log(
        f"    Optimized and pruned to {len(coords)} structures -> {outname}"
    )
    return outname


def refine_operator(filename: str, embedder) -> None:
    """Handled by the Embedder itself (sets structures from the molecule)."""
    return None


def neb_operator(filename: str, embedder) -> str:
    """Double-ended TS search (firecode/operators.py:270-419): the input file
    provides reagent+product (2 frames) or reagent+TS-guess+product (3)."""
    from firecode_tpu.opt import optimize_batch
    from firecode_tpu.opt.neb import run_neb

    mol = _mol_for(filename, embedder)
    neb_opts = embedder.options.neb
    band_guess = None
    if len(mol.coords) == 2:
        start, end = mol.coords
        ts_guess = None
    elif len(mol.coords) == 3:
        start, ts_guess, end = mol.coords
    elif len(mol.coords) >= 4:
        if neb_opts is not None and neb_opts.pairs:
            if len(mol.coords) % 2:
                raise InputError(
                    f"NEB(pairs) needs an even number of structures in "
                    f"{filename}, found {len(mol.coords)}"
                )
            # ensemble-pairs extension: frames [r1, p1, r2, p2, ...] relax
            # as ONE batched multi-band NEB device program
            return _neb_operator_batched(filename, embedder, mol)
        # reference semantics (firecode/operators.py:290-296): many frames
        # (e.g. a scan> trajectory) are the MEP guess — endpoints + a band
        # resampled to n_images from the given path
        start, end = mol.coords[0], mol.coords[-1]
        ts_guess = None
        n_img = neb_opts.n_images if neb_opts else (embedder.options.images or 7)
        # fractional interpolation along the given path: integer rounding
        # would duplicate adjacent images (zero tangent/spring) whenever
        # n_images does not evenly divide the frame count
        t = np.linspace(0.0, len(mol.coords) - 1.0, n_img)
        lo = np.floor(t).astype(int)
        hi = np.minimum(lo + 1, len(mol.coords) - 1)
        frac = (t - lo)[:, None, None]
        path = mol.coords.astype(np.float64)
        band_guess = (1.0 - frac) * path[lo] + frac * path[hi]
        embedder.log(
            f"    {len(mol.coords)} structures as input: casting {n_img} "
            "images from them as the NEB MEP guess"
        )
    else:
        raise InputError(
            f"neb> needs >= 2 structures in {filename}, found {len(mol.coords)}"
        )

    calc = _get_calc(embedder, mol)
    neb_options = embedder.options.neb
    n_images = neb_options.n_images if neb_options else (embedder.options.images or 7)

    if neb_options is None or neb_options.preopt:
        embedder.log("    Pre-optimizing NEB endpoints")
        res = optimize_batch(calc, np.stack([start, end]), fmax=0.05, max_steps=2000)
        ends = np.asarray(res.coords, dtype=np.float64)
        start, end = ends[0], ends[1]
        if band_guess is not None:
            band_guess[0], band_guess[-1] = start, end

    # up to 3 attempts, each restarting from the previous band (reference
    # restart-from-checkpoint logic, firecode/operators.py:349-394)
    band = band_guess
    for attempt in range(3):
        result = run_neb(
            calc,
            start,
            end,
            n_images=n_images,
            ts_guess=ts_guess,
            images=band,
            climbing_image=neb_options.climbing_image if neb_options else True,
            logfunction=lambda s: embedder.log(s, p=False),
        )
        if result.converged:
            break
        band = result.images
        embedder.log(f"    NEB attempt {attempt + 1} hit MAX ITER - restarting from the current band")
    barrier = result.ts_energy - result.energies[0]
    embedder.log(
        f"    NEB {'converged' if result.converged else 'MAX ITER'}: TS is image "
        f"{result.ts_index + 1}/{len(result.images)}, barrier = {barrier:.2f} kcal/mol"
    )
    mep_name = f"{Path(filename).stem}_MEP.xyz"
    write_xyz(mep_name, mol.atoms, result.images, energies=None)
    outname = f"{Path(filename).stem}_TS.xyz"
    write_xyz(outname, mol.atoms, result.ts_coords)
    return outname


def _neb_operator_batched(filename: str, embedder, mol) -> str:
    """Batched pairs mode of neb>: [r1, p1, r2, p2, ...] -> R bands in one
    device program per stage (firecode_tpu.opt.neb.run_neb_batch)."""
    from firecode_tpu.opt import optimize_batch
    from firecode_tpu.opt.neb import run_neb_batch

    calc = _get_calc(embedder, mol)
    neb_options = embedder.options.neb
    n_images = neb_options.n_images if neb_options else (embedder.options.images or 7)
    pairs = mol.coords.reshape(-1, 2, mol.n_atoms, 3)
    starts, ends = pairs[:, 0], pairs[:, 1]
    embedder.log(f"    Batched NEB over {len(pairs)} reagent/product pairs")

    if neb_options is None or neb_options.preopt:
        embedder.log("    Pre-optimizing all endpoints (one batch)")
        res = optimize_batch(
            calc, mol.coords.astype(np.float64), fmax=0.05, max_steps=2000
        )
        opt = np.asarray(res.coords, dtype=np.float64).reshape(-1, 2, mol.n_atoms, 3)
        starts, ends = opt[:, 0], opt[:, 1]

    result = run_neb_batch(
        calc, starts, ends, n_images=n_images,
        climbing_image=neb_options.climbing_image if neb_options else True,
        logfunction=lambda s: embedder.log(s, p=False),
    )
    barriers = result.ts_energy - result.energies[:, 0]
    for r, (conv, barrier) in enumerate(zip(result.converged, barriers)):
        embedder.log(
            f"    Band {r + 1}: {'converged' if conv else 'MAX ITER'}, "
            f"barrier = {barrier:.2f} kcal/mol (TS image "
            f"{int(result.ts_index[r]) + 1}/{n_images})"
        )
        write_xyz(
            f"{Path(filename).stem}_MEP_{r + 1}.xyz", mol.atoms, result.images[r],
            energies=None,
        )
    outname = f"{Path(filename).stem}_TS.xyz"
    write_xyz(outname, mol.atoms, result.ts_coords)
    return outname


def rdkit_search_operator(filename: str, embedder) -> str:
    """ETKDG conformer generation via rdkit (gated; constrained searches map
    to the same entry — reference rdkit_tools.py:48-124, racerts delegation)."""
    from firecode_tpu.rdkit_tools import etkdg_conformers

    mol = _mol_for(filename, embedder)
    confs = etkdg_conformers(
        mol.atomnos, mol.coords[0], n_confs=embedder.options.max_confs
    )
    outname = f"{Path(filename).stem}_rdkit_confs.xyz"
    write_xyz(outname, mol.atoms, confs)
    embedder.log(f"    ETKDG generated {len(confs)} conformers -> {outname}")
    return outname


def fsm_operator(filename: str, embedder) -> str:
    """Freezing-string TS search from reagent+product frames
    (firecode/ase_manipulations.py:1402-1510)."""
    from firecode_tpu.opt.fsm import run_fsm
    from firecode_tpu.opt.saddle import saddle_refine

    mol = _mol_for(filename, embedder)
    if len(mol.coords) < 2:
        raise InputError(f"fsm> needs reagent and product frames in {filename}")
    calc = _get_calc(embedder, mol)
    result = run_fsm(
        calc,
        mol.coords[0],
        mol.coords[-1],
        n_nodes=embedder.options.images or 12,
        logfunction=lambda s: embedder.log(s, p=False),
    )
    embedder.log(
        f"    FSM: TS guess at node {result.ts_index + 1}, "
        f"E = {result.ts_energy:.2f} kcal/mol; refining saddle"
    )
    refined = saddle_refine(calc, result.ts_coords, fmax=0.05)
    write_xyz(f"{Path(filename).stem}_FSM_string.xyz", mol.atoms, result.string)
    outname = f"{Path(filename).stem}_TS.xyz"
    write_xyz(outname, mol.atoms, refined.coords if refined.converged else result.ts_coords)
    return outname


def scan_operator(filename: str, embedder) -> str:
    """Distance (2 indices) or dihedral (4 indices) scan
    (firecode/operators.py:644-843)."""
    mol = _mol_for(filename, embedder)
    pairs = _internal_constraints_for(filename, embedder)
    if pairs and len(pairs[0]) == 2:
        return _distance_scan(mol, pairs[0], embedder)
    dihedrals = [c for c in mol.constraints if c.type_ == "D"]
    if dihedrals:
        return _dihedral_scan(mol, dihedrals[0].indices, embedder)
    if len(mol.reactive_indices) == 2:
        return _distance_scan(mol, tuple(mol.reactive_indices), embedder)
    raise InputError(
        "scan> needs a distance pair (two same-letter indices) or a dihedral "
        "constraint line."
    )


def _distance_scan(mol, pair, embedder, step: float = -0.05) -> str:
    """Approach scan along one distance with relaxation at each point."""
    from firecode_tpu.opt import Constraints, optimize_batch
    from firecode_tpu.pt import COVALENT_RADII

    i1, i2 = (int(x) for x in pair)
    calc = _get_calc(embedder, mol)
    coords = mol.coords[0].copy()
    d_start = float(np.linalg.norm(coords[i1] - coords[i2]))
    d_min = 0.9 * float(COVALENT_RADII[mol.atomnos[i1]] + COVALENT_RADII[mol.atomnos[i2]])

    distances, frames = [], []
    d = d_start
    while d > d_min:
        cons = Constraints().add_distance(i1, i2, d, k=1000.0)
        res = optimize_batch(calc, coords, constraints=cons, fmax=0.1, max_steps=800)
        coords = np.asarray(res.coords, dtype=np.float64)
        distances.append(d)
        frames.append(coords.copy())
        d += step

    # bare surface energies (the optimizer's include the restraint penalty)
    import jax.numpy as jnp

    energies = np.asarray(calc.energy(jnp.asarray(np.stack(frames))))
    energies_arr = np.array(energies) - min(energies)
    mol.scan_data = (distances, energies_arr.tolist())
    peak = _scan_peak_index(energies_arr.tolist())
    embedder.log(
        f"    Scan: {len(distances)} points, peak at d = {distances[peak]:.2f} A "
        f"({energies_arr[peak]:.2f} kcal/mol)"
    )

    write_xyz(f"{Path(mol.filename).stem}_scan_peak.xyz", mol.atoms, frames[peak])
    outname = f"{Path(mol.filename).stem}_scan.xyz"
    write_xyz(outname, mol.atoms, np.stack(frames))
    _plot_scan(distances, energies_arr, Path(mol.filename).stem, "Distance (A)")
    # the full trajectory is the operator output (reference operators.py:
    # 810-843): a chained neb> uses it as the MEP guess, a chained saddle>
    # picks the maximum via mol.scan_data
    return outname


def _dihedral_scan(mol, quad, embedder, n_points: int | None = None) -> str:
    from firecode_tpu.opt import Constraints, optimize_batch
    from firecode_tpu.prune.oracle import np_dihedral

    n_points = n_points or embedder.options.custom_rotation_steps or 36
    calc = _get_calc(embedder, mol)
    coords = mol.coords[0].copy()
    phi0 = np_dihedral(coords[list(quad)])
    angles, frames = [], []
    for k in range(n_points + 1):
        phi = phi0 + k * 360.0 / n_points
        cons = Constraints().add_dihedral(tuple(int(x) for x in quad), phi, k=100.0)
        res = optimize_batch(calc, coords, constraints=cons, fmax=0.1, max_steps=800)
        coords = np.asarray(res.coords, dtype=np.float64)
        angles.append(phi)
        frames.append(coords.copy())

    # bare surface energies (the optimizer's include the restraint penalty)
    import jax.numpy as jnp

    energies = np.asarray(calc.energy(jnp.asarray(np.stack(frames))))
    energies_arr = np.array(energies) - min(energies)
    mol.scan_data = (angles, energies_arr.tolist())
    peak = _scan_peak_index(energies_arr.tolist())
    write_xyz(f"{Path(mol.filename).stem}_scan_peak.xyz", mol.atoms, frames[peak])
    outname = f"{Path(mol.filename).stem}_scan.xyz"
    write_xyz(outname, mol.atoms, np.stack(frames))
    _plot_scan(angles, energies_arr, Path(mol.filename).stem, "Dihedral (deg)")
    return outname


def _scan_peak_index(energies: list[float], max_thr: float = 50.0, min_thr: float = 0.1) -> int:
    """Most prominent peak (firecode/utils.py:315-338)."""
    n = len(energies)
    peaks = [
        i
        for i in range(n)
        if energies[i - 1] < energies[i] >= energies[(i + 1) % n]
        and max_thr > energies[i] > min_thr
    ]
    if not peaks:
        return int(np.argmax(energies))
    if len(peaks) == 1:
        return peaks[0]
    return max(peaks, key=lambda i: energies[i])


def _plot_scan(xs, ys, stem: str, xlabel: str) -> None:
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.figure()
        plt.plot(xs, ys)
        plt.xlabel(xlabel)
        plt.ylabel("Rel. E (kcal/mol)")
        plt.savefig(f"{stem}_scan.svg")
        plt.close()
    except Exception:
        pass


def saddle_operator(filename: str, embedder) -> str:
    """Saddle refinement of the (first) structure; uses the scan peak if the
    scan> operator ran earlier (firecode/operators.py:846-946)."""
    from firecode_tpu.opt.saddle import saddle_refine

    mol = _mol_for(filename, embedder)
    calc = _get_calc(embedder, mol)
    scan_data = getattr(mol, "scan_data", None)
    if scan_data is not None and len(mol.coords) == len(scan_data[1]):
        # chained after scan>: refine the scan PEAK (same prominence logic as
        # the scan's own pick — a raw argmax would grab over-compressed
        # repulsive-wall frames at the end of distance scans), reference
        # operators.py:846-946
        guess_id = _scan_peak_index(list(scan_data[1]))
        embedder.log(
            f"    Chained after scan>: refining scan point {guess_id + 1}"
            f"/{len(mol.coords)}"
        )
    else:
        guess_id = 0
    result = saddle_refine(
        calc, mol.coords[guess_id], logfunction=lambda s: embedder.log(s, p=False)
    )
    embedder.log(
        f"    Saddle {'converged' if result.converged else 'NOT converged'}: "
        f"E = {result.energy:.3f} kcal/mol, fmax = {result.fmax:.4f}"
    )
    outname = f"{Path(filename).stem}_saddle.xyz"
    write_xyz(outname, mol.atoms, result.coords)
    return outname


def freq_operator(filename: str, embedder) -> str:
    """Frequencies + qRRHO report for each conformer
    (firecode/operators.py:949-987)."""
    from firecode_tpu.opt.hessian import (
        cleanup_frequencies,
        mass_weighted_frequencies,
        batch_hessian,
    )
    from firecode_tpu.thermo import rrho_thermo
    import jax.numpy as jnp

    mol = _mol_for(filename, embedder)
    calc = _get_calc(embedder, mol)
    energies = np.asarray(calc.energy(jnp.asarray(mol.coords)))
    hessians = np.asarray(batch_hessian(calc, jnp.asarray(mol.coords)))
    report = []
    for c, h in enumerate(hessians):
        freqs, _ = mass_weighted_frequencies(h, mol.atomnos)
        vib, n_imag = cleanup_frequencies(freqs, mol.coords[c])
        data = rrho_thermo(
            vib, mol.coords[c], mol.atomnos,
            T=embedder.options.T, P=embedder.options.P, C=embedder.options.C,
            solvent=embedder.options.solvent, sweep=True,
        )
        embedder.log(
            f"    Conformer {c + 1}: {n_imag} imag, lowest vib "
            f"{vib[0]:.1f} cm^-1, G_corr = {data['g_corr']:.3f} kcal/mol"
        )
        report.append(
            {
                "conformer": c + 1,
                "frequencies_cm-1": [round(float(f), 2) for f in vib],
                "n_imaginary": int(n_imag),
                **{
                    k: round(float(v), 5)
                    for k, v in data.items()
                    if np.isscalar(v)
                },
                "rot_table_sigma_TSrot": [
                    [sn, round(ts, 5)] for sn, ts in data["rot_table"]
                ],
            }
        )
        if c == 0:
            # ORCA-mock .out for the best conformer (reference
            # thermochemistry.py:490-511)
            from firecode_tpu.thermo import write_orca_mock_out

            out_mock = f"{Path(filename).stem}_freq.out"
            write_orca_mock_out(
                out_mock, mol.atomnos, vib, float(energies[c]), data,
                T=embedder.options.T, charge=mol.charge,
            )
            embedder.log(f"    Wrote ORCA-style artifact to {out_mock}")
    # JSON artifact with the full thermochemistry (reference writes a JSON
    # dump + ORCA-mock .out, thermochemistry.py:481-511)
    import json

    out_json = f"{Path(filename).stem}_thermo.json"
    Path(out_json).write_text(json.dumps(report, indent=2))
    embedder.log(f"    Wrote thermochemistry data to {out_json}")
    return filename


def entropy_operator(
    filename: str, embedder, qrrho: bool = False, group: bool = False,
    top: int = 10,
) -> str:
    """Ensemble population / conformational-entropy report.

    The CREST ecosystem prints S_conf, the ensemble free energy and the
    Boltzmann populations with every pruned ensemble (cregen; the dedicated
    --entropy mode); the reference only gets those numbers out of the CREST
    binary (reference interfaces/crest.py:444). Here they are native:
    batched ensemble energies (one device call) -> host population analysis.
    `entropy(qrrho=1)>` adds per-conformer qRRHO G_corr from batched exact
    Hessians, so populations are over free energies rather than E_el;
    `entropy(group=1)>` first collapses rotamer duplicates (rot-corr RMSD
    groups, cregen's degeneracy bookkeeping) and weights each unique
    conformer by its multiplicity."""
    import jax.numpy as jnp

    from firecode_tpu.ensemble_thermo import ensemble_analysis

    mol = _mol_for(filename, embedder)
    calc = _get_calc(embedder, mol)
    coords = jnp.asarray(mol.coords)
    # np.array (not asarray): device arrays view as read-only, and the
    # qrrho branch accumulates G_corr in place
    g = np.array(calc.energy(coords), dtype=np.float64)
    if qrrho:
        from firecode_tpu.opt.hessian import (
            batch_hessian,
            cleanup_frequencies,
            mass_weighted_frequencies,
        )
        from firecode_tpu.thermo import rrho_thermo

        hessians = np.asarray(batch_hessian(calc, coords))
        for c, h in enumerate(hessians):
            freqs, _ = mass_weighted_frequencies(h, mol.atomnos)
            vib, _ = cleanup_frequencies(freqs, mol.coords[c])
            g[c] += rrho_thermo(
                vib, mol.coords[c], mol.atomnos,
                T=embedder.options.T, P=embedder.options.P,
                C=embedder.options.C, solvent=embedder.options.solvent,
            )["g_corr"]

    idx = np.arange(len(g))
    deg = None
    if group:
        from firecode_tpu.ensemble_thermo import rotamer_degeneracies

        idx, deg, g_group = rotamer_degeneracies(
            mol.coords, mol.atomnos, energies=g,
            rmsd_thr=min(embedder.options.rmsd, 0.25),
        )
        embedder.log(
            f"    Rotamer grouping: {len(g)} structures -> {len(idx)} "
            f"unique conformers"
        )
        g = g_group  # each group weighted by its lowest member (cregen-style)

    res = ensemble_analysis(g, T=embedder.options.T, degeneracies=deg)
    p = res["populations"]
    label = "G(qRRHO)" if qrrho else "E_el"
    embedder.log(
        f"    {res['n_conformers']} conformers at T = {res['T']:.2f} K "
        f"({label} weighting):"
    )
    order = np.argsort(g, kind="stable")
    for rank, i in enumerate(order[: max(int(top), 1)]):
        gtag = f", g = {int(deg[i])}" if deg is not None else ""
        embedder.log(
            f"      #{rank + 1} (conf {idx[i] + 1}): rel {label} = "
            f"{g[i] - res['g_min_kcal']:7.3f} kcal/mol, "
            f"pop = {100 * p[i]:6.2f} %{gtag}"
        )
    embedder.log(
        f"    S_conf = {res['s_conf_cal_mol_k']:.3f} cal/(mol K)   "
        f"-T*S_conf = {res['minus_t_s_conf_kcal']:.3f} kcal/mol\n"
        f"    G_conf = {res['g_conf_kcal']:.3f} kcal/mol   "
        f"<G> = {res['g_avg_kcal']:.3f} kcal/mol   "
        f"({res['n_for_90pct']} conformer(s) cover 90% of the population)"
    )

    import json

    out_json = f"{Path(filename).stem}_entropy.json"
    Path(out_json).write_text(
        json.dumps(
            {
                **{k: v for k, v in res.items() if k != "populations"},
                "weighting": label,
                "conformer_indices": [int(i) for i in idx],
                **(
                    {"degeneracies": [int(d) for d in deg]}
                    if deg is not None
                    else {}
                ),
                "rel_energies_kcal": [round(float(x - g.min()), 5) for x in g],
                "populations": [round(float(x), 6) for x in p],
            },
            indent=2,
        )
    )
    embedder.log(f"    Wrote population analysis to {out_json}")
    return filename


def pka_operator(filename: str, embedder) -> str:
    from firecode_tpu.driver.pka import pka_routine

    pka_routine(filename, embedder)
    return filename


# ----------------------------------------------------- external-engine ops


def crest_operator(filename: str, embedder) -> str:
    from firecode_tpu.interfaces.crest import crest_mtd_search

    return crest_mtd_search(filename, embedder)


def goat_operator(filename: str, embedder) -> str:
    from firecode_tpu.interfaces.goat import goat_search

    return goat_search(filename, embedder)


def packmol_operator(filename: str, embedder) -> str:
    from firecode_tpu.interfaces.packmol import solvate_molecule

    return solvate_molecule(filename, embedder)


def equilibrate_operator(filename: str, embedder) -> str:
    from firecode_tpu.md.equilibration import equilibrate

    return equilibrate(filename, embedder)
