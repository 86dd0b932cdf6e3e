"""Standalone optimizer CLI: `firecode-tpu-opt [files...]`.

Capability parity with the reference's firecode_opt
(firecode/standalone_optimizer.py:62-776): geometry optimization /
single-point / saddle / IRC / frequency jobs on multi-conformer .xyz files,
constraint files ("B i j [val]" lines), automatic charge from +/- signs in
the filename, and a results table. All conformers of a file are optimized as
ONE device batch.
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import numpy as np


def charge_from_filename(name: str) -> int:
    return name.count("+") - name.count("-")


def multiplicity_check(atomnos: np.ndarray, charge: int, multiplicity: int = 1) -> bool:
    """True when multiplicity and electron count have opposite parity (a
    physically consistent pair) — reference standalone_optimizer.py:765."""
    electrons = int(np.sum(atomnos)) - charge
    return (multiplicity % 2) != (electrons % 2)


def parse_constraint_file(path: str | Path):
    """Constraint file: 'B i j [value|auto]' / 'A i j k [value]' /
    'D i j k l [value]' lines, optionally preceded by a 'SMARTS <pattern>'
    header — indices then refer to atoms WITHIN the pattern and are
    translated onto each molecule by substructure matching (reference
    standalone_optimizer.py:146-176). Returns (specs, smarts_or_None)."""
    specs = []
    smarts = None
    lines = [
        stripped
        for raw in Path(path).read_text().splitlines()
        if (stripped := raw.split("#")[0].strip())
    ]
    if lines and lines[0].upper().startswith("SMARTS"):
        smarts = lines.pop(0)[len("SMARTS"):].strip()
    for line in lines:
        parts = line.split()
        kind = parts[0].upper()
        n_idx = {"B": 2, "A": 3, "D": 4}[kind]
        indices = tuple(int(x) for x in parts[1 : 1 + n_idx])
        value = parts[1 + n_idx] if len(parts) > 1 + n_idx else "auto"
        specs.append((kind, indices, value))
    return specs, smarts


def translate_specs(specs, smarts, atomnos, coords):
    """Translate SMARTS-relative constraint indices onto this molecule."""
    if smarts is None:
        return specs
    from firecode_tpu.rdkit_tools import match_smarts_with_symmetry

    match = match_smarts_with_symmetry(
        atomnos, coords, smarts, single_match_expected=True
    )[0][0]
    return [
        (kind, tuple(int(match[i]) for i in indices), value)
        for kind, indices, value in specs
    ]


def build_constraints(specs, coords):
    from firecode_tpu.opt import Constraints
    from firecode_tpu.prune.oracle import np_dihedral

    cons = Constraints()
    for kind, indices, value in specs:
        pts = coords[list(indices)]
        if value == "auto":
            if kind == "B":
                value = float(np.linalg.norm(pts[0] - pts[1]))
            elif kind == "A":
                v1, v2 = pts[0] - pts[1], pts[2] - pts[1]
                value = float(
                    np.degrees(
                        np.arccos(
                            np.clip(
                                v1 @ v2 / (np.linalg.norm(v1) * np.linalg.norm(v2)),
                                -1,
                                1,
                            )
                        )
                    )
                )
            else:
                value = np_dihedral(pts)
        else:
            value = float(value)
        if kind == "B":
            cons.add_distance(*indices, value)
        elif kind == "A":
            cons.add_angle(*indices, value)
        else:
            cons.add_dihedral(indices, value)
    return cons


def _inquire(parser, args):
    """Guided prompt flow (reference standalone_optimizer.py:356 analog)."""
    import glob
    import sys

    if not sys.stdin.isatty() and not args.files:
        parser.print_help()
        raise SystemExit(1)

    if not args.files:
        pattern = input("xyz file(s) or glob pattern: ").strip()
        args.files = sorted(glob.glob(pattern)) or [pattern]
    job = input("job [opt/sp/saddle/freq] (default opt): ").strip().lower()
    if job == "sp":
        args.sp = True
    elif job == "saddle":
        args.saddle = True
        if input("follow with IRC? [y/N]: ").strip().lower() == "y":
            args.irc = True
    elif job == "freq":
        args.freq = True
    charge = input("charge (default from filename +/- signs): ").strip()
    if charge:
        args.charge = int(charge)
    solvent = input("solvent (default none): ").strip()
    if solvent:
        args.solvent = solvent
    return args


def main(argv: list[str] | None = None) -> None:
    parser = argparse.ArgumentParser(
        prog="firecode-tpu-opt",
        description="Batched optimizer: opt/SP/saddle/IRC/freq on .xyz files.",
    )
    parser.add_argument("files", nargs="*", help="multi-conformer .xyz files")
    parser.add_argument(
        "-i", "--interactive", action="store_true",
        help="prompt for files and job options (reference firecode_opt "
        "interactive mode)",
    )
    parser.add_argument("--sp", action="store_true", help="single-point only")
    parser.add_argument("--saddle", action="store_true", help="saddle-point search")
    parser.add_argument("--irc", action="store_true", help="IRC from the saddle")
    parser.add_argument("--freq", action="store_true", help="frequencies + qRRHO")
    parser.add_argument("--fmax", type=float, default=0.05)
    parser.add_argument("--charge", type=int, default=None)
    parser.add_argument("--mult", type=int, default=1, help="spin multiplicity")
    parser.add_argument("--calc", default=None, help="calculator override")
    parser.add_argument("--solvent", default=None)
    parser.add_argument("--constraints", default=None, help="constraint file")
    parser.add_argument("--cpu", action="store_true", help="force CPU backend")
    parser.add_argument("-T", type=float, default=298.15)
    args = parser.parse_args(argv)

    if args.interactive or not args.files:
        args = _inquire(parser, args)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from firecode_tpu.settings import apply_env_defaults

    apply_env_defaults()
    import os

    import jax.numpy as jnp

    from firecode_tpu.calculators.dispatcher import Dispatcher
    from firecode_tpu.ensemble import Ensemble
    from firecode_tpu.io.xyz import write_xyz
    from firecode_tpu.opt import optimize_batch

    calc_name = args.calc or os.environ.get("FIRECODE_TPU_CALCULATOR", "LITEFF")
    dispatcher = Dispatcher(calc_name)

    rows = []

    # bucketed mixed-molecule batching (SURVEY section 7 hard-part 5): plain
    # OPT jobs over several files run as ONE device program — every
    # (file, conformer) pair is a lane with its own padded topology. Works
    # for the DEFAULT calculator (GFNFF, stacked generated force fields)
    # and LITEFF. The reference processes files serially
    # (standalone_optimizer.py:513).
    plain_opt = not (args.sp or args.saddle or args.freq or args.constraints)
    if plain_opt and len(args.files) > 1 and calc_name in ("GFNFF", "LITEFF"):
        _bucketed_multifile_opt(args, rows, calc_name)
        _print_rows(rows)
        return

    for filename in args.files:
        t0 = time.perf_counter()
        ens = Ensemble.from_xyz(filename)
        charge = args.charge if args.charge is not None else charge_from_filename(filename)
        if not multiplicity_check(ens.atomnos, charge, args.mult):
            print(
                f"WARNING: {filename}: charge {charge} / multiplicity "
                f"{args.mult} is inconsistent with the electron count"
            )
        calc = dispatcher.get_batch_calc(
            ens.atomnos, ens.coords[0], charge=charge, solvent=args.solvent
        )
        if args.constraints:
            specs, smarts = parse_constraint_file(args.constraints)
            specs = translate_specs(specs, smarts, ens.atomnos, ens.coords[0])
        else:
            specs = []
        cons = build_constraints(specs, ens.coords[0]) if specs else None
        stem = Path(filename).stem

        if args.sp:
            energies = np.asarray(calc.energy(jnp.asarray(ens.coords)))
            for c, e in enumerate(energies):
                rows.append((stem, c + 1, "SP", e, "-"))
            print(f"{filename}: single-point energies computed")
        elif args.saddle:
            from firecode_tpu.opt.saddle import irc_relax, saddle_refine

            result = saddle_refine(calc, ens.coords[0], fmax=args.fmax)
            write_xyz(f"{stem}_saddle.xyz", ens.atoms, result.coords)
            rows.append(
                (stem, 1, "SADDLE", result.energy, "ok" if result.converged else "FAIL")
            )
            if args.irc and result.converged:
                fwd, rev = irc_relax(calc, result.coords, ens.atomnos)
                write_xyz(f"{stem}_irc_fwd.xyz", ens.atoms, fwd)
                write_xyz(f"{stem}_irc_rev.xyz", ens.atoms, rev)
                print(f"{filename}: IRC endpoints written")
        else:
            res = optimize_batch(
                calc, ens.coords, constraints=cons, fmax=args.fmax, max_steps=3000
            )
            coords = np.asarray(res.coords, dtype=np.float64)
            energies = np.asarray(res.energy, dtype=np.float64)
            conv = np.asarray(res.converged)
            order = np.argsort(energies)
            coords, energies, conv = coords[order], energies[order], conv[order]
            write_xyz(f"{stem}_opt.xyz", ens.atoms, coords, energies=None)
            for c, (e, ok) in enumerate(zip(energies, conv)):
                rows.append((stem, c + 1, "OPT", e, "ok" if ok else "MAX ITER"))
            print(
                f"{filename}: optimized {len(coords)} conformers "
                f"({time.perf_counter() - t0:.1f} s) -> {stem}_opt.xyz"
            )

        if args.freq:
            from firecode_tpu.opt.hessian import frequencies
            from firecode_tpu.thermo import get_free_energies

            target = coords if not (args.sp or args.saddle) else ens.coords
            gs = get_free_energies(
                calc, ens.atomnos, target, T=args.T, expect_ts=args.saddle,
                logfunction=print,
            )
            vib, n_imag = frequencies(
                calc, ens.atomnos, target[0], expect_ts=args.saddle
            )
            print(
                f"{filename}: lowest vib {vib[0]:.1f} cm^-1, {n_imag} imaginary, "
                f"best G = {gs.min():.3f} kcal/mol"
            )

    _print_rows(rows)


def _print_rows(rows) -> None:
    if not rows:
        return
    print("\n{:<20} {:>5} {:>8} {:>14} {:>9}".format(
        "file", "conf", "job", "E (kcal/mol)", "status"
    ))
    print("-" * 60)
    for name, conf, job, e, status in rows:
        print(f"{name:<20} {conf:>5} {job:>8} {e:>14.4f} {status:>9}")


def _bucketed_multifile_opt(args, rows, calc_name: str = "GFNFF") -> None:
    """All files' conformers as one mixed-size batched FIRE program."""
    import time

    import jax.numpy as jnp

    from firecode_tpu.ensemble import Ensemble
    from firecode_tpu.io.xyz import write_xyz
    from firecode_tpu.opt import optimize_batch

    t0 = time.perf_counter()
    lanes = []  # (file stem, conformer index within file)
    systems = []
    charges = []
    all_ens = []
    for filename in args.files:
        ens = Ensemble.from_xyz(filename)
        all_ens.append((Path(filename).stem, ens))
        q = args.charge if args.charge is not None else charge_from_filename(filename)
        for c in range(len(ens.coords)):
            systems.append((np.asarray(ens.atomnos), np.asarray(ens.coords[c])))
            charges.append(q)
            lanes.append((Path(filename).stem, c))
    if calc_name == "GFNFF":
        from firecode_tpu.calculators.gfnff import StackedGFNFF

        calc = StackedGFNFF(systems, charges=charges)
        coords_p, mask = calc.padded_coords, calc.atom_mask
    else:
        from firecode_tpu.calculators.forcefield import StackedLiteFF, pad_systems

        atomnos_p, coords_p, mask = pad_systems(systems)
        calc = StackedLiteFF(systems, charges=charges)
    res = optimize_batch(
        calc, jnp.asarray(coords_p), fmax=args.fmax, max_steps=3000,
        atom_mask=jnp.asarray(mask),
    )
    coords = np.asarray(res.coords, dtype=np.float64)
    energies = np.asarray(res.energy, dtype=np.float64)
    conv = np.asarray(res.converged)
    k = 0
    for stem, ens in all_ens:
        n_c = len(ens.coords)
        n_real = len(ens.atomnos)
        file_coords = coords[k : k + n_c, :n_real]
        file_e = energies[k : k + n_c]
        file_ok = conv[k : k + n_c]
        order = np.argsort(file_e)
        write_xyz(f"{stem}_opt.xyz", ens.atoms, file_coords[order], energies=None)
        for c, (e, ok) in enumerate(zip(file_e[order], file_ok[order])):
            rows.append((stem, c + 1, "OPT", e, "ok" if ok else "MAX ITER"))
        k += n_c
    print(
        f"bucketed batch: {len(lanes)} conformers from {len(all_ens)} files "
        f"optimized as one device program ({time.perf_counter() - t0:.1f} s)"
    )


if __name__ == "__main__":
    main()
