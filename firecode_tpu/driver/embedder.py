"""Workflow driver: input parsing -> embed -> batched refine -> output.

Capability parity with the reference Embedder/RunEmbedding (firecode/
embedder.py:93-2979), redesigned around batched device execution:

- the reference's per-structure ProcessPoolExecutor optimization loop
  (embedder.py:2085-2242) becomes ONE batched FIRE relaxation per
  constraint-group (firecode_tpu.opt.optimize_batch) — the ensemble axis is
  the batch axis, ragged convergence is handled by masks, and a multi-chip
  mesh shards the same call;
- pruning cascades run as the blockwise device kernels (firecode_tpu.prune);
- pose generation is the batched embed module (firecode_tpu.embed.embeds).

Input-file format, keyword language, constraint lines, pairing letters,
operator chains, logging artifacts and termination semantics mirror the
reference so existing inputs port unchanged.
"""

from __future__ import annotations

import os
import re
import sys
import time
from dataclasses import dataclass
from pathlib import Path
from string import ascii_lowercase
from typing import Any, Sequence

import numpy as np

from firecode_tpu.embed.embeds import (
    cyclical_embed,
    monomolecular_embed,
    multiembed_dispatcher,
    string_embed,
)
from firecode_tpu.embed.hypermolecule import Hypermolecule
from firecode_tpu.errors import InputError, ZeroCandidatesError
from firecode_tpu.graphs import get_sum_graph, scramble_check_batch
from firecode_tpu.driver.options import KEYWORDS, Options, OptionSetter
from firecode_tpu.io.xyz import write_xyz
from firecode_tpu.pt import COVALENT_RADII
from firecode_tpu.settings import apply_env_defaults


@dataclass
class Constraint:
    """Declarative geometric constraint (B: bond, A: angle, D: dihedral)."""

    indices: tuple[int, ...]
    value: float
    fixed: bool = True
    charge: int | None = None

    @property
    def type_(self) -> str:
        return {2: "B", 3: "A", 4: "D"}[len(self.indices)]


def _dihedrals_batch(coords: np.ndarray, quads: np.ndarray) -> np.ndarray:
    """Dihedral angles (degrees) for [B, N, 3] coords over [Q, 4] quads -> [B, Q].

    Same convention as prune.oracle.np_dihedral, vectorized over batch."""
    p0 = coords[:, quads[:, 0]]
    p1 = coords[:, quads[:, 1]]
    p2 = coords[:, quads[:, 2]]
    p3 = coords[:, quads[:, 3]]
    b0 = p0 - p1
    b1 = p2 - p1
    b2 = p3 - p2
    b1n = b1 / np.linalg.norm(b1, axis=-1, keepdims=True)
    v = b0 - np.sum(b0 * b1n, axis=-1, keepdims=True) * b1n
    w = b2 - np.sum(b2 * b1n, axis=-1, keepdims=True) * b1n
    x = np.sum(v * w, axis=-1)
    y = np.sum(np.cross(b1n, v) * w, axis=-1)
    return np.degrees(np.arctan2(y, x))


def get_ts_d_estimate(z1: int, z2: int, factor: float = 1.35) -> float:
    """TS distance estimate: scaled covalent-radii sum (firecode/utils.py:651)."""
    return factor * float(COVALENT_RADII[z1] + COVALENT_RADII[z2])


class Embedder:
    """Parses the input file and prepares everything needed for the run."""

    def __init__(
        self, filename: str, stamp: str | None = None, resume: str | None = None
    ) -> None:
        self.t_start_run = time.perf_counter()
        self.resume_path = resume
        self._resume_done = None
        apply_env_defaults()

        parent = os.path.dirname(filename)
        if parent:
            os.chdir(parent)
            filename = os.path.basename(filename)

        self.stamp = stamp or time.strftime("%b_%d_%H-%M")
        log_path = f"firecode_{self.stamp}.log"
        if os.path.exists(log_path):
            os.remove(log_path)
        self.logfile = open(log_path, "a", buffering=1, encoding="utf-8")
        self.warnings: list[str] = []

        self.options = Options()
        self.embed: str | None = None
        self.ids: np.ndarray | None = None
        self.constrained_indices: np.ndarray | None = None

        self.write_banner()

        inp = self._parse_input(filename)
        self.objects = [
            Hypermolecule(name, reactive_indices=ids) for name, ids in inp
        ]
        self.ids = np.array([mol.n_atoms for mol in self.objects])
        self.graphs = [mol.graph for mol in self.objects]

        self._read_pairings()
        self.check_objects_compenetration()
        self._set_options()
        self.check_saturation()
        self._calculator_setup()
        self._print_references()
        self._apply_operators()
        self._setup()

    @property
    def device_mesh(self):
        """Ensemble mesh over all visible devices (None when single-device).

        Built once per run; prune cascades and batched optimizations shard
        the ensemble axis over it — the multi-chip replacement for the
        reference's process pool (firecode/embedder.py:2085-2242)."""
        if not hasattr(self, "_device_mesh"):
            import jax

            from firecode_tpu.parallel import ensemble_mesh

            devs = jax.devices()
            self._device_mesh = ensemble_mesh() if len(devs) > 1 else None
            if self._device_mesh is not None:
                self.log(
                    f"--> Ensemble mesh over {len(devs)} devices "
                    "(sharded prune + optimization)"
                )
        return self._device_mesh

    @property
    def mols(self) -> dict:
        """Library API: deep copies of the molecule objects keyed by filename
        (reference embedder.py:220-223)."""
        import copy

        return {mol.filename: copy.deepcopy(mol) for mol in self.objects}

    # ------------------------------------------------------------ logging

    def log(self, string: str = "", p: bool = True) -> None:
        if p:
            print(string)
        self.logfile.write(string + "\n")

    def debuglog(self, string: str = "") -> None:
        if self.options.debug:
            self.log(f"DEBUG: {string}", p=False)

    def warn(self, string: str) -> None:
        self.warnings.append(string)
        self.log(string)

    def log_warnings(self) -> None:
        if self.warnings:
            self.log("\n" + "*" * 30 + "  W A R N I N G S  " + "*" * 30)
            for w in self.warnings:
                self.log(w)
            self.log("*" * 79)

    def write_banner(self) -> None:
        from firecode_tpu import __version__

        self.log(
            f"\n*** firecode_tpu v{__version__} — TPU-native conformational "
            f"ensemble engine ***\n    stamp: {self.stamp}\n"
        )

    # ------------------------------------------------------------ parsing

    def _parse_input(self, filename: str) -> list[tuple[str, tuple[int, ...] | None]]:
        lines = Path(filename).read_text().splitlines()
        self.log(f"--> Input file: {filename}\n")
        for i, line in enumerate(lines):
            self.log(f"{i + 1:2}> | {line}")
        self.log("")

        lines = [line.split("#")[0].rstrip() for line in lines]
        lines = [line.replace(", ", ",") for line in lines if line.strip()]

        first_tokens = lines[0].split() if lines else []
        first_words = [
            w.split("=")[0] if "(" not in w else w.split("(")[0] for w in first_tokens
        ]
        looks_like_keywords = any(w.upper() in KEYWORDS for w in first_words) or (
            first_tokens
            and not any("." in w or Path(w).exists() for w in first_tokens)
        )
        if looks_like_keywords:
            self.kw_line, *mol_lines = lines
        else:
            self.kw_line = ""
            mol_lines = lines

        self.mol_lines = mol_lines
        self._parse_constraint_lines()

        def strip_internal_constraints(frags: list[str]) -> tuple[int, ...]:
            numbers = [int(re.sub(r"[^0-9]", "", f)) for f in frags]
            letters = [re.sub(r"[^A-Za-z]", "", f) for f in frags]
            counts = [letters.count(le) if le else 1 for le in letters]
            return tuple(n for n, c in zip(numbers, counts) if c == 1)

        inp: list[tuple[str, tuple[int, ...] | None]] = []
        for li, line in enumerate(self.mol_lines):
            if ">" in line:
                ops = [op.strip() for op in reversed(line.split(">")[:-1])]
                self.options.operators_dict[li] = ops
                self.options.operators.append(line)
                line = line.split(">")[-1].lstrip()
            molname, *rest = line.split()
            rest = [f for f in rest if "=" not in f]
            reactive = strip_internal_constraints(rest) if rest else None
            inp.append((molname, reactive))
        return inp

    def _parse_constraint_lines(self) -> None:
        """Lines starting with a space define B/A/D constraints for the
        molecule above them (firecode/embedder.py:518-637)."""
        all_lines = [line for line in self.mol_lines if line.strip()]
        self.mol_lines = []
        self._pending_constraints: dict[int, list[Constraint]] = {}

        for li, line in enumerate(all_lines):
            if not line.startswith(" "):
                self.mol_lines.append(line)
                continue
            mol_id = len(self.mol_lines) - 1
            parts = line.split()
            props = {}
            clean = []
            for part in parts:
                if "=" in part:
                    k, v = part.split("=")
                    props[k] = v
                else:
                    clean.append(part)
            letter = clean[0].upper()
            spec = {"B": (2, 3), "A": (3, 4), "D": (4, 5)}.get(letter)
            if spec is None:
                raise SyntaxError(
                    f'Constraint type "{letter}" not understood in line {line!r} '
                    "(B: bond, A: angle, D: dihedral)"
                )
            n_idx, _ = spec
            indices = tuple(int(x) for x in clean[1 : 1 + n_idx])
            value_part = clean[1 + n_idx] if len(clean) > 1 + n_idx else "auto"
            self._pending_constraints.setdefault(mol_id, []).append(
                (indices, value_part, props)  # resolved after molecules load
            )

    def _resolve_constraints(self) -> None:
        for mol_id, specs in getattr(self, "_pending_constraints", {}).items():
            mol = self.objects[mol_id]
            for indices, value_part, props in specs:
                coords = mol.coords[0]
                if value_part == "auto":
                    value = self._measure(coords, indices)
                elif value_part == "ts" and len(indices) == 2:
                    value = get_ts_d_estimate(
                        int(mol.atomnos[indices[0]]), int(mol.atomnos[indices[1]])
                    )
                else:
                    value = float(value_part)
                c = Constraint(indices, value)
                for k, v in props.items():
                    setattr(c, k, _cast(v))
                mol.constraints.append(c)

    @staticmethod
    def _measure(coords: np.ndarray, indices: tuple[int, ...]) -> float:
        from firecode_tpu.prune.oracle import np_dihedral

        pts = coords[list(indices)]
        if len(indices) == 2:
            return float(np.linalg.norm(pts[0] - pts[1]))
        if len(indices) == 3:
            v1, v2 = pts[0] - pts[1], pts[2] - pts[1]
            cos = np.clip(v1 @ v2 / (np.linalg.norm(v1) * np.linalg.norm(v2)), -1, 1)
            return float(np.degrees(np.arccos(cos)))
        return np_dihedral(pts)

    def _read_pairings(self) -> None:
        """Pairing letters (2a 5b...) -> cumulative index pairs
        (firecode/embedder.py:639-802)."""
        self._resolve_constraints()
        parsed: list[tuple[int, str]] = []
        unlabeled_list: list[int] = []
        self.pairings_dict: dict[int, dict[str, Any]] = {
            i: {} for i in range(len(self.objects))
        }

        for i, line in enumerate(self.mol_lines):
            frags = line.split(">")[-1].split()[1:]
            pairings: list[tuple[int, str]] = []
            unlabeled: list[int] = []
            for frag in frags:
                if "=" in frag:
                    name, value = frag.split("=")
                    setattr(self.objects[i], name, _cast(value))
                    continue
                if not frag.lower().islower():
                    unlabeled.append(int(frag))
                else:
                    m = re.fullmatch(r"(\d+)([A-Za-z]+)", frag)
                    if m is None:
                        raise InputError(
                            f"Could not parse reactive index fragment {frag!r} "
                            "(expected e.g. '2a' or '7ab')"
                        )
                    for letter in m.group(2):
                        pairings.append((int(m.group(1)), letter))

            # internal distance constraints become same-letter pairs
            for constr in self.objects[i].constraints:
                if constr.type_ == "B":
                    used = {le.lower() for _, le in pairings}
                    letter = next(le for le in ascii_lowercase if le not in used)
                    if constr.fixed:
                        letter = letter.upper()
                    pairings.append((constr.indices[0], letter))
                    pairings.append((constr.indices[1], letter))

            for index, letter in pairings:
                prev = self.pairings_dict[i].get(letter)
                if prev is not None:
                    self.pairings_dict[i][letter] = (prev, index)
                else:
                    self.pairings_dict[i][letter] = index

            offset = int(sum(self.ids[:i])) if i > 0 else 0
            parsed.extend((index + offset, letter) for index, letter in pairings)
            unlabeled_list.extend(z + offset for z in unlabeled)

        links: dict[str, list[int]] = {}
        for index, tag in parsed:
            links.setdefault(tag, []).append(index)
        self.pairings_table: dict[str, tuple[int, int]] = {
            le: tuple(sorted(ids)) for le, ids in sorted(links.items())
        }
        for letter, ids in self.pairings_table.items():
            if len(ids) != 2:
                raise SyntaxError(
                    f"Letter '{letter}' must appear exactly twice (found {len(ids)})."
                )

        if len(self.mol_lines) in (2, 3) and len(unlabeled_list) == 2:
            self.pairings_table["?"] = tuple(sorted(unlabeled_list))

        # internal constraints (same-molecule distance pairs with an imposed value)
        internal = []
        for letter, pair in self.pairings_table.items():
            for mol_id in self.pairings_dict:
                if isinstance(self.pairings_dict[mol_id].get(letter), tuple):
                    if f"{letter}=" in (self.kw_line or "") or letter.isupper():
                        internal.append(pair)
        self.internal_constraints = np.array(internal, dtype=int).reshape(-1, 2)

        # internal angle/dihedral constraints at embed level
        self.internal_angle_dih_constraints: list[Constraint] = []
        for i, mol in enumerate(self.objects):
            offset = int(sum(self.ids[:i])) if i > 0 else 0
            for c in mol.constraints:
                if c.type_ in ("A", "D"):
                    self.internal_angle_dih_constraints.append(
                        Constraint(tuple(x + offset for x in c.indices), c.value, c.fixed)
                    )

    # ------------------------------------------------------------ checks

    def check_objects_compenetration(self) -> None:
        """Warn when input conformers contain sub-0.5 A contacts
        (firecode/embedder.py:454-462)."""
        import jax.numpy as jnp

        from firecode_tpu.ops.clash import count_clashes

        for mol in self.objects:
            clashes = np.asarray(count_clashes(jnp.asarray(mol.coords), thr=0.5))
            for c, n in enumerate(clashes):
                if n > 0:
                    self.warn(
                        f"--> WARNING! {mol.filename}, conformer {c + 1} looks "
                        f"compenetrated ({int(n)} interatomic distances < 0.5 A)"
                    )

    def check_saturation(self) -> None:
        """Valence-parity sanity check (firecode/utils.py:494-584)."""
        from firecode_tpu.pt import TRANSITION_METALS

        odd_valent = {
            "H", "Li", "Na", "K", "Rb", "Cs", "F", "Cl", "Br", "I", "At",
            "N", "P", "As", "Sb", "Bi", "B", "Al", "Ga", "In", "Tl",
        }
        for mol in self.objects:
            atoms = [str(a) for a in mol.atoms]
            if any(a in TRANSITION_METALS for a in atoms):
                continue  # organometallics: cannot tell, assume fine
            n_odd = sum(1 for a in atoms if a in odd_valent)
            looks_ok = ((n_odd + mol.charge) % 2) == 0
            if looks_ok or self.options.mult % 2 == 0:
                self.log(
                    f"--> {mol.filename}: saturation check passed "
                    f"(CHG={mol.charge}, MULT={self.options.mult})"
                )
            else:
                self.warn(
                    f"--> WARNING! {mol.filename}: saturation check failed "
                    f"(odd saturation index with CHG={mol.charge}, "
                    f"MULT={self.options.mult}). Bad input geometry?"
                )

    def _print_references(self) -> None:
        from firecode_tpu.references import references_for_options

        self.log("\n--> Literature for the methods used in this run:")
        for ref in references_for_options(self.options):
            self.log(f"    {ref}")
        self.log()

    # ------------------------------------------------------------ setup

    def _set_options(self) -> None:
        setter = OptionSetter(self)
        setter.set_options()
        if "CHARGE" not in setter.keywords and len(self.objects) == 1:
            self.options.charge = getattr(self.objects[0], "charge", 0)
        self.log(f"--> CHG={self.options.charge} MULT={self.options.mult}")

    def _calculator_setup(self) -> None:
        from firecode_tpu.calculators.dispatcher import Dispatcher

        self.dispatcher = Dispatcher(self.options.calculator)
        if self.options.theory_level is None:
            self.options.theory_level = os.environ.get(
                f"FIRECODE_TPU_DEFAULT_LEVEL_{self.options.calculator}",
                self.options.calculator,
            )

    def set_custom_orbs(self, orb_string: str) -> None:
        """DIST(a=2.345,b=3.456): impose half-distances as orbital lengths
        (firecode/embedder.py:843-902)."""
        for mol in self.objects:
            if not mol.reactive_atoms and len(mol.reactive_indices):
                mol.compute_orbitals(
                    override="single" if self.options.simpleorbitals else None
                )
        self.pairing_dists = {
            p.split("=")[0]: float(p.split("=")[1]) for p in orb_string.split(",")
        }
        self.orb_string = orb_string
        for letter, dist in self.pairing_dists.items():
            if letter not in self.pairings_table:
                raise SyntaxError(
                    f"Letter '{letter}' in DIST but not present in molecule lines."
                )
            for i, mol in enumerate(self.objects):
                r_index = self.pairings_dict[i].get(letter)
                if r_index is None or isinstance(r_index, tuple):
                    continue
                mol.set_orb_dim(int(r_index), dist / 2)

        # record imposed distances for fixed internal pairs
        for mol_id, pairings in self.pairings_dict.items():
            for letter, ids in pairings.items():
                if isinstance(ids, tuple) and letter.isupper():
                    if letter not in self.pairing_dists:
                        coords = self.objects[mol_id].coords[0]
                        self.pairing_dists[letter] = float(
                            np.linalg.norm(coords[ids[0]] - coords[ids[1]])
                        )

    def _apply_operators(self) -> None:
        from firecode_tpu.driver.operators import operate

        self._setup(p=False)
        for index, operators in self.options.operators_dict.items():
            for operator in operators:
                outname = operate(self.objects[index].filename, operator, self)
                if operator == "refine":
                    self.set_structures_from_mol()
                elif operator not in ("pka",) and outname is not None:
                    old = self.objects[index]
                    self.objects[index] = Hypermolecule(
                        outname,
                        reactive_indices=list(old.reactive_indices),
                        charge=old.charge,
                        mult=old.mult,
                    )
                    self.objects[index].constraints = old.constraints
                    if hasattr(old, "scan_data") and "scan" in operator:
                        # a chained saddle>/neb> consumes the scan profile
                        # (reference operators.py:846-946 scan-max pick);
                        # only carried across the scan's OWN output — any
                        # other operator reorders/alters frames and would
                        # leave the stored energies pointing at the wrong
                        # structures
                        self.objects[index].scan_data = old.scan_data
                    if len(old.reactive_indices):
                        self.objects[index].compute_orbitals(
                            override="single" if self.options.simpleorbitals else None
                        )
                    if hasattr(self, "orb_string"):
                        self.set_custom_orbs(self.orb_string)
                    if (
                        ("search" in operator or "mtd" in operator)
                        and self.options.noembed
                        and len(self.objects) == 1
                    ):
                        self.set_structures_from_mol()
        self.embed = None

    def set_structures_from_mol(self) -> None:
        """REFINE runs: embedder structures = single molecule's conformers."""
        mol = self.objects[0]
        self.structures = mol.coords.copy()
        self.atomnos = mol.atomnos
        self.atoms = mol.atoms
        pairs = list(self.pairings_table.values()) if self.pairings_table else []
        self.constrained_indices = np.array(
            [pairs for _ in self.structures], dtype=int
        ).reshape(len(self.structures), -1, 2)
        self.ids = None
        self.energies = np.zeros(len(self.structures))
        self.exit_status = np.ones(len(self.structures), dtype=bool)
        from firecode_tpu.graphs import graphize

        self.embed_graph = get_sum_graph(
            [graphize(self.atomnos, self.structures[0])],
            self.constrained_indices[0] if len(pairs) else None,
        )

    def _setup(self, p: bool = True) -> None:
        """Classify embed type, build pivots + systematic angle grid
        (firecode/embedder.py:991-1179)."""
        o = self.options
        if any("pka>" in op for op in o.operators) or any(
            "scan>" in op for op in o.operators
        ):
            self.embed = "data"
            return
        if any("refine>" in op for op in o.operators) or o.noembed:
            self.embed = "refine"
            o.charge = getattr(self.objects[0], "charge", 0)
            return

        for mol in self.objects:
            if o.max_confs < len(mol.coords) and self.embed is not None:
                self.log(
                    f"--> {mol.filename} - kept {o.max_confs}/{len(mol.coords)} "
                    "conformers for the embed (override with CONFS=n)"
                )
                mol.coords = mol.coords[: o.max_confs]

        if all(len(mol.reactive_indices) == 0 for mol in self.objects):
            self.embed = None
            return

        override = "single" if o.simpleorbitals else None

        if len(self.objects) == 1:
            mol = self.objects[0]
            if len(mol.reactive_indices) == 2:
                self.embed = "monomolecular"
                mol.compute_orbitals(override=override)
                mol.set_pivots(suprafacial=o.suprafacial)
                o.only_refined = True
                o.fix_angles_in_deformation = True
            else:
                raise InputError(self._embed_error_msg())
            return

        if len(self.objects) not in (2, 3):
            raise InputError("Too many molecules for an embed (max 3).")

        cyclical = all(len(m.reactive_indices) == 2 for m in self.objects)
        chelotropic = sorted(len(m.reactive_indices) for m in self.objects) == [1, 2]
        string = (
            len(self.objects) == 2
            and all(len(m.reactive_indices) == 1 for m in self.objects)
        )
        multiembed = (
            len(self.objects) == 2
            and all(len(m.reactive_indices) >= 2 for m in self.objects)
            and not cyclical
        )

        if cyclical or chelotropic or multiembed:
            self.embed = (
                "cyclical" if cyclical else "multiembed" if multiembed else "chelotropic"
            )
            for mol in self.objects:
                mol.compute_orbitals(override=override)
                if self.embed == "chelotropic":
                    # slightly enlarged lobes for chelotropic embeds
                    for c in mol.reactive_atoms:
                        for i, atom in mol.reactive_atoms[c].items():
                            mol.reactive_atoms[c][i] = atom.with_orb_dim(
                                atom.orb_dim + 0.2
                            )
            o.rotation_steps = o.custom_rotation_steps or 5
            steps = o.rotation_steps
            grid = np.stack(
                np.meshgrid(*[np.arange(steps + 1)] * len(self.objects), indexing="ij"),
                -1,
            ).reshape(-1, len(self.objects))
            self.systematic_angles = list(
                grid * 2 * o.rotation_range / steps - o.rotation_range
            )
            if p:
                for mol in self.objects:
                    mol.set_pivots(suprafacial=o.suprafacial)
        elif string:
            self.embed = "string"
            o.rotation_steps = o.custom_rotation_steps or 36
            for mol in self.objects:
                if not mol.reactive_atoms:
                    mol.compute_orbitals(override=override)
            self.systematic_angles = [
                n * 360 / o.rotation_steps for n in range(o.rotation_steps)
            ]
        else:
            raise InputError(self._embed_error_msg())

        if p:
            offset = 0
            for mol in self.objects:
                mol.set_cumnums(offset)
                offset += mol.n_atoms
            if o.shrink:
                for mol in self.objects:
                    mol.scale_orbs(o.shrink_multiplier)
                    mol.set_pivots(suprafacial=o.suprafacial)
                o.only_refined = True
            self.log("--> Setup performed correctly.\n")

    def _embed_error_msg(self) -> str:
        lines = [
            f" - {m.filename} ({len(m.reactive_indices)} reactive indices)"
            for m in self.objects
        ]
        return (
            "Bad input:\n" + "\n".join(lines) + "\n"
            "Accepted configurations:\n"
            "1) One molecule, two reactive centers (monomolecular)\n"
            "2) 2-3 molecules, two reactive centers each (cyclical)\n"
            "3) Two molecules, one reactive center each (string)\n"
            "4) Two molecules, 1+2 reactive centers (chelotropic)\n"
            "5) Two molecules, >=2 reactive centers each (multiembed)"
        )

    def embed_requested(self) -> bool:
        return self.embed in (
            "string", "chelotropic", "cyclical", "monomolecular", "multiembed",
        )

    # --------------------------------------------------- pairing distances

    def get_pairing_dist_from_letter(self, letter: str) -> float | None:
        if getattr(self, "pairing_dists", None) and self.pairing_dists.get(letter):
            return self.pairing_dists[letter]
        for mol_id, mol in enumerate(self.objects):
            if letter in self.pairings_dict[mol_id]:
                ids = self.pairings_dict[mol_id][letter]
                if isinstance(ids, tuple):
                    for c in mol.constraints:
                        if tuple(c.indices) == ids:
                            return c.value
        d = 0.0
        try:
            for mol_id, pairs in self.pairings_dict.items():
                r_index = pairs.get(letter)
                if r_index is None:
                    continue
                if isinstance(r_index, tuple):
                    return self.objects[mol_id].get_orbital_length(
                        r_index[0]
                    ) + self.objects[mol_id].get_orbital_length(r_index[1])
                d += self.objects[mol_id].get_orbital_length(r_index)
            if self.options.shrink:
                d /= self.options.shrink_multiplier
            return d or None
        except Exception:
            return None

    def get_pairing_dists_from_constrained_indices(
        self, pair: Sequence[int]
    ) -> float | None:
        for letter, p in self.pairings_table.items():
            if tuple(sorted(p)) == tuple(sorted(int(x) for x in pair)):
                return self.get_pairing_dist_from_letter(letter)
        return None

    def temporary_constraints_present(self) -> bool:
        if any(le.islower() for le in self.pairings_table):
            return True
        return any(
            not c.fixed for mol in self.objects for c in mol.constraints
        )

    # ------------------------------------------------------------ output

    def rel_energies(self) -> np.ndarray:
        return self.energies - np.min(self.energies)

    def apply_mask(self, attributes: Sequence[str], mask: np.ndarray) -> None:
        for attr in attributes:
            value = getattr(self, attr, None)
            if value is not None and len(value) == len(mask):
                setattr(self, attr, value[mask])

    def write_structures(
        self,
        tag: str,
        energies: bool = True,
        p: bool = True,
        extra: str = "",
        align: str | bool = True,
    ) -> str:
        structures = self.structures
        if align and len(structures) > 1:
            # superpose for readable output: Kabsch onto the first structure,
            # or principal-axes ("moi") alignment
            # (reference align_structures / align_by_moi, embedder.py:1702-1705)
            import jax.numpy as jnp

            if align == "moi":
                from firecode_tpu.ops.inertia import moi_align
                from firecode_tpu.pt import MASSES

                structures = np.asarray(
                    moi_align(
                        jnp.asarray(structures),
                        jnp.asarray(MASSES[self.atomnos]),
                    )
                )
            else:
                from firecode_tpu.ops.rmsd import kabsch_align

                structures = np.asarray(
                    kabsch_align(jnp.asarray(structures), jnp.asarray(structures[0]))
                )
        if len(structures) > 10000 and not self.options.let:
            self.log(
                f"Truncated {tag} output to 10000 structures "
                f"(from {len(structures)} - use LET to override)."
            )
            structures = structures[:10000]
        self.outname = f"firecode_{tag}_{self.stamp}.xyz"
        with open(self.outname, "w") as f:
            for i, structure in enumerate(structures):
                title = f"Structure {i + 1} - {tag}"
                if energies and hasattr(self, "energies") and len(self.energies) == len(
                    self.structures
                ):
                    rel = self.energies[i] - np.min(self.energies)
                    title += f" Rel. E. = {rel:.3f} kcal/mol"
                title += extra
                write_xyz(f, self.atoms, structure, title=title)
        if p:
            self.log(f"Wrote {len(structures)} {tag} structures to {self.outname}\n")
        return self.outname

    def run(self) -> None:
        RunEmbedding(self).run()

    def normal_termination(self) -> None:
        from firecode_tpu.graphs import graphize  # noqa: F401

        if hasattr(self, "outname") and os.path.exists(self.outname):
            os.rename(self.outname, f"firecode_final_ensemble_{self.stamp}.xyz")
        self.log_warnings()
        elapsed = time.perf_counter() - self.t_start_run
        self.log(f"\n--> firecode_tpu normal termination: total time {elapsed:.1f} s.")
        if hasattr(self, "structures") and len(self.structures) and hasattr(self, "energies"):
            show = min(10, len(self.energies))
            rel = self.energies[:show] - np.min(self.energies)
            if np.max(self.energies - np.min(self.energies)) > 0:
                from firecode_tpu.ensemble_thermo import ensemble_analysis

                ens = ensemble_analysis(self.energies, T=self.options.T)
                pops = ens["populations"]
                self.log(f"\n--> Energies of output structures (first {show})")
                for i, e in enumerate(rel):
                    self.log(
                        f"> Candidate {i + 1:2}    {e:.2f} kcal/mol "
                        f"({100 * pops[i]:5.1f} %)"
                    )
                self.log(
                    f"--> Ensemble: S_conf = {ens['s_conf_cal_mol_k']:.2f} "
                    f"cal/(mol K), G_conf - G_min = "
                    f"{ens['g_conf_kcal'] - ens['g_min_kcal']:.2f} kcal/mol, "
                    f"{ens['n_for_90pct']} conformer(s) cover 90% of the "
                    f"population at {self.options.T:.2f} K"
                )
            with open("firecode_best.xyz", "w") as f:
                write_xyz(f, self.atoms, self.structures[0])

        from firecode_tpu.quotes import random_quote

        quote, author = random_quote()
        self.log(f"\n    {quote}")
        if author:
            self.log(f"    - {author}")
        self.logfile.close()
        sys.exit(0)


def _cast(value: str):
    low = value.lower()
    if low in ("none", ""):
        return None
    if low in ("true", "yes", "on"):
        return True
    if low in ("false", "no", "off"):
        return False
    try:
        return int(value)
    except ValueError:
        pass
    try:
        return float(value)
    except ValueError:
        pass
    return value


class RunEmbedding:
    """Pipeline executor: generate -> prune -> batched optimize -> output."""

    def __init__(self, embedder: Embedder) -> None:
        self.__dict__ = embedder.__dict__
        self._embedder = embedder

    def __getattr__(self, name):
        return getattr(self._embedder, name)

    # delegate helpers operating on shared state
    log = Embedder.log
    debuglog = Embedder.debuglog
    warn = Embedder.warn
    log_warnings = Embedder.log_warnings
    rel_energies = Embedder.rel_energies
    apply_mask = Embedder.apply_mask
    write_structures = Embedder.write_structures
    normal_termination = Embedder.normal_termination
    embed_requested = Embedder.embed_requested
    get_pairing_dists_from_constrained_indices = (
        Embedder.get_pairing_dists_from_constrained_indices
    )
    get_pairing_dist_from_letter = Embedder.get_pairing_dist_from_letter
    temporary_constraints_present = Embedder.temporary_constraints_present

    def zero_candidates_check(self) -> None:
        if len(self.structures) == 0:
            self.log_warnings()
            raise ZeroCandidatesError()

    # -------------------------------------------------------- generation

    def generate_candidates(self) -> None:
        embed_functions = {
            "chelotropic": cyclical_embed,
            "cyclical": cyclical_embed,
            "monomolecular": monomolecular_embed,
            "string": string_embed,
            "multiembed": multiembed_dispatcher,
        }
        if self.embed == "refine":
            return
        self.structures = embed_functions[self.embed](self)
        self.atomnos = np.concatenate([m.atomnos for m in self.objects])
        self.atoms = np.concatenate([m.atoms for m in self.objects])

        additional_bonds = self.constrained_indices[0]
        if len(self.internal_constraints) > 0:
            additional_bonds = np.concatenate(
                (self.internal_constraints, additional_bonds)
            )
        self.embed_graph = get_sum_graph(self.graphs, additional_bonds)
        self.log(
            f"Generated {len(self.structures)} candidates "
            f"({time.perf_counter() - self.t_start_run:.1f} s)\n"
        )
        self.write_structures("embedded", energies=False)

    # ----------------------------------------------------------- pruning

    def compenetration_refining(self) -> None:
        if self.embed not in ("string", "cyclical", "chelotropic", "monomolecular"):
            self.log("--> Checking structures for compenetrations")
            import jax.numpy as jnp

            from firecode_tpu.ops.clash import compenetration_ok, count_clashes

            if self.ids is not None:
                frag_ids = np.concatenate(
                    [np.full(n, k, np.int32) for k, n in enumerate(self.ids)]
                )
                mask = np.asarray(
                    compenetration_ok(
                        jnp.asarray(self.structures),
                        jnp.asarray(frag_ids),
                        thr=self.options.clash_thresh,
                        max_clashes=self.options.max_clashes,
                    )
                )
            else:
                clashes = np.asarray(count_clashes(jnp.asarray(self.structures)))
                mask = clashes <= self.options.max_clashes
            self.apply_mask(("structures", "constrained_indices"), mask)
            if not mask.all():
                self.log(
                    f"Discarded {int((~mask).sum())} candidates for compenetration "
                    f"({int(mask.sum())} left)"
                )
            self.zero_candidates_check()

        self.energies = np.full(len(self.structures), 1e10)
        self.exit_status = np.zeros(len(self.structures), dtype=bool)

    def similarity_refining(
        self, tfd: bool = False, moi: bool = True, rmsd: bool = True, verbose: bool = False
    ) -> None:
        """TFD -> MOI -> RMSD -> rotamer-corrected RMSD device cascade
        (firecode/embedder.py:1412-1516), with the same scale ceilings."""
        from firecode_tpu.prune import (
            prune_by_moi,
            prune_by_rmsd,
            prune_by_rmsd_rot_corr,
            prune_by_tfd,
        )

        if verbose:
            self.log("--> Similarity Processing")
        before = len(self.structures)
        attr = ("structures", "constrained_indices", "energies", "exit_status")
        energies = (
            self.energies
            if hasattr(self, "energies")
            and len(self.energies) == len(self.structures)
            and np.any(self.energies != 1e10)
            and np.any(self.energies != 0)
            else None
        )

        if tfd and getattr(self, "embed_graph", None) is not None:
            if self.embed_graph.graph.get("is_single_molecule", False) or len(self.objects) > 1:
                from firecode_tpu.torsions import get_quadruplets

                quads = get_quadruplets(self.embed_graph)
                if len(quads):
                    mask = prune_by_tfd(self.structures, quads, mesh=self.device_mesh)
                    self.apply_mask(attr, mask)
                    if energies is not None:
                        energies = energies[mask]
                    if not mask.all():
                        self.log(
                            f"Discarded {int((~mask).sum())} structures for TFD "
                            f"similarity ({int(mask.sum())} left)"
                        )

        # NOTE: the reference skips MOI/RMSD pruning above 1e5 structures and
        # rot-corr RMSD above 1e3 (firecode/embedder.py:1449-1511) — CPU-era
        # truncations. The tiled device kernels scale past both, so the
        # ceilings are deleted here; above the reference's old limits we log
        # the fact (LET-style) instead of silently turning pruning off.
        if moi:
            if len(self.structures) > 1e5:
                self.log(
                    f"MOI pruning at {len(self.structures)} structures "
                    "(reference CPU ceiling of 1e5 does not apply)"
                )
            mask = prune_by_moi(
                self.structures, self.atomnos, energies=energies,
                mesh=self.device_mesh,
            )
            self.apply_mask(attr, mask)
            if energies is not None:
                energies = energies[mask]
            if not mask.all():
                self.log(
                    f"Discarded {int((~mask).sum())} candidates for MOI "
                    f"similarity ({int(mask.sum())} left)"
                )

        if rmsd:
            if len(self.structures) > 1e5:
                self.log(
                    f"RMSD pruning at {len(self.structures)} structures "
                    "(reference CPU ceiling of 1e5 does not apply)"
                )
            mask = prune_by_rmsd(
                self.structures, self.atomnos, rmsd_thr=self.options.rmsd,
                energies=energies, mesh=self.device_mesh,
            )
            self.apply_mask(attr, mask)
            if energies is not None:
                energies = energies[mask]
            if not mask.all():
                self.log(
                    f"Discarded {int((~mask).sum())} candidates for RMSD "
                    f"similarity ({int(mask.sum())} left)"
                )
            if getattr(self, "embed_graph", None) is not None:
                if len(self.structures) > 1e3:
                    self.log(
                        f"Symmetry-corrected RMSD pruning at "
                        f"{len(self.structures)} structures (reference CPU "
                        "ceiling of 1e3 does not apply; energy-gated)"
                    )
                mask = prune_by_rmsd_rot_corr(
                    self.structures, self.atomnos, rmsd_thr=self.options.rmsd,
                    energies=energies, mesh=self.device_mesh,
                )
                self.apply_mask(attr, mask)
                if not mask.all():
                    self.log(
                        f"Discarded {int((~mask).sum())} candidates for "
                        f"symmetry-corrected RMSD similarity ({int(mask.sum())} left)"
                    )

        if verbose and len(self.structures) == before:
            self.log("All structures passed the similarity check.")
        self.log()

    def fitness_refining(self, threshold: float = 5.0, verbose: bool = False) -> None:
        """Discard structures whose summed constrained-distance deviations
        exceed the threshold (firecode/embedder.py:1999-2041)."""
        if verbose:
            self.log("--> Fitness pruning - removing inaccurate structures")
        b = len(self.structures)
        mask = np.ones(b, dtype=bool)
        ci = np.asarray(self.constrained_indices)
        if b and ci.size:
            # vectorized: one [B, P] gather + reduce instead of a per-structure
            # Python loop (SURVEY.md section 7 "never per-structure Python in
            # the hot path"); targets are looked up once per distinct pair
            pairs = ci.reshape(b, -1, 2)  # [B, P, 2]
            targets = np.empty(pairs.shape[:2])  # [B, P]
            counted = np.zeros(pairs.shape[:2], dtype=bool)
            uniq, inverse = np.unique(
                pairs.reshape(-1, 2), axis=0, return_inverse=True
            )
            t_of_uniq = np.array(
                [
                    self.get_pairing_dists_from_constrained_indices(tuple(p))
                    for p in uniq
                ],
                dtype=object,
            )
            flat_t = t_of_uniq[inverse]
            counted.reshape(-1)[:] = np.array([t is not None for t in flat_t])
            targets.reshape(-1)[:] = np.array(
                [0.0 if t is None else float(t) for t in flat_t]
            )
            d = np.linalg.norm(
                self.structures[np.arange(b)[:, None], pairs[..., 0]]
                - self.structures[np.arange(b)[:, None], pairs[..., 1]],
                axis=-1,
            )
            total_dev = np.sum(np.abs(d - targets) * counted, axis=-1)
            mask = total_dev <= threshold
        self.apply_mask(
            ("structures", "energies", "constrained_indices", "exit_status"), mask
        )
        if not mask.all():
            self.log(
                f"Discarded {int((~mask).sum())} candidates for unfitness "
                f"({int(mask.sum())} left)"
            )
        elif verbose:
            self.log("All candidates meet the imposed criteria.")
        self.log()
        self.zero_candidates_check()

    # ------------------------------------------------------ optimization

    def _get_embed_calc(self):
        """Calculator over the combined system (per-molecule bond graphs)."""
        if getattr(self, "_embed_calc", None) is None:
            self._embed_calc = self.dispatcher.get_batch_calc(
                self.atomnos,
                self.structures[0],
                graph=get_sum_graph(self.graphs)
                if self.ids is not None
                else self.embed_graph_bonds_only(),
                charge=self.options.charge,
                solvent=self.options.solvent,
            )
        return self._embed_calc

    def embed_graph_bonds_only(self):
        from firecode_tpu.graphs import graphize

        return graphize(self.atomnos, self.structures[0])

    def _ezprot_quadruplets(self) -> list[tuple[int, int, int, int]]:
        """Dihedral quadruplets across double bonds, for EZPROT
        (firecode/embedder_options.py EZPROT keyword: double bond protection)."""
        from firecode_tpu.graphs import get_double_bonds_indices, graphize

        graph = graphize(self.atomnos, self.structures[0])
        quads = []
        for i, j in get_double_bonds_indices(self.atomnos, self.structures[0]):
            i_nb = [n for n in graph.neighbors(i) if n != j]
            j_nb = [n for n in graph.neighbors(j) if n != i]
            if i_nb and j_nb:
                quads.append((i_nb[0], i, j, j_nb[0]))
        return quads

    def _constraint_groups(self, only_fixed_constraints: bool):
        """Group structure indices by identical constraint signatures, so one
        batched optimization serves each group.

        Grouping is numpy-vectorized (np.unique over pair blocks + a batched
        dihedral classification for EZPROT) — per-structure Python work is
        O(#distinct groups), not O(B)."""
        ez_quads = (
            self._ezprot_quadruplets()
            if self.options.double_bond_protection
            else []
        )
        b = len(self.structures)
        if only_fixed_constraints:
            uniq_blocks = [
                [tuple(v) for k, v in self.pairings_table.items() if k.isupper()]
            ]
            block_ids = np.zeros(b, dtype=np.int64)
        else:
            ci = np.asarray(self.constrained_indices).reshape(b, -1, 2)
            uniq, block_ids = np.unique(
                ci.reshape(b, -1), axis=0, return_inverse=True
            )
            extra = [tuple(p) for p in self.internal_constraints]
            uniq_blocks = [
                [tuple(p) for p in u.reshape(-1, 2)] + extra for u in uniq
            ]
        sigs = []
        for pairs in uniq_blocks:
            sig = []
            for pair in sorted(set(pairs)):
                target = self.get_pairing_dists_from_constrained_indices(pair)
                sig.append((int(pair[0]), int(pair[1]), target))
            sigs.append(tuple(sig))
        # EZPROT: pin each double bond to its current E/Z configuration
        if ez_quads:
            phi = _dihedrals_batch(self.structures, np.asarray(ez_quads))  # [B, Q]
            ez_cls = (np.abs(phi) >= 90.0).astype(np.int64)
        else:
            ez_cls = np.zeros((b, 0), dtype=np.int64)
        combined = np.concatenate(
            [block_ids.reshape(b, 1), ez_cls], axis=1
        )
        uniq_keys, key_inverse = np.unique(combined, axis=0, return_inverse=True)
        groups: dict[tuple, list[int]] = {}
        for gi, key in enumerate(uniq_keys):
            sig = sigs[int(key[0])]
            ez_sig = tuple(
                (tuple(int(x) for x in q), 0.0 if c == 0 else 180.0)
                for q, c in zip(ez_quads, key[1:])
            )
            # MERGE: two distinct np.unique row blocks can normalize to the
            # same sorted-set signature (e.g. permuted or duplicated pairs);
            # overwriting would silently drop the first block's structures
            # from optimization entirely
            groups.setdefault((sig, ez_sig), []).extend(
                int(i) for i in np.nonzero(key_inverse == gi)[0]
            )
        return groups

    def optimization_refining(
        self,
        maxiter: int | None = None,
        conv_thr: str = "tight",
        only_fixed_constraints: bool = False,
        resume_done=None,
    ) -> None:
        """Batched constrained relaxation of the whole ensemble.

        resume_done: optional bool[B] mask of structures already optimized in
        a previous (killed) run of THIS stage — they are skipped and their
        snapshot energies/exit status kept."""
        from firecode_tpu.driver.checkpoint import save_state
        from firecode_tpu.opt import Constraints, optimize_batch

        self.outname = (
            f"firecode_{'ensemble' if self.embed == 'refine' else 'poses'}_{self.stamp}.xyz"
        )
        task = (
            "Structure optimization (tight) / relaxing interactions"
            if only_fixed_constraints
            else "Structure optimization (loose)"
        )
        fmax = {"loose": 0.5, "tight": 0.05}.get(conv_thr, 0.05)
        max_steps = maxiter or (1000 if conv_thr == "loose" else 8000)
        self.log(
            f"--> {task} ({self.options.theory_level} level via "
            f"{self.options.calculator}, batched on device)"
        )

        calc = self._get_embed_calc()
        b = len(self.structures)
        if resume_done is None:
            done = np.zeros(b, dtype=bool)
            self.energies = np.zeros(b)
        else:
            # snapshot energies/exit status of completed structures survive;
            # the rest restart from zero like a fresh stage
            done = np.asarray(resume_done, dtype=bool).copy()
            self.energies = np.where(done, self.energies, 0.0)
        t_start = time.perf_counter()
        stage_tag = f"optimization_{conv_thr}"
        n_since_save = 0

        spring_k = 500.0 if only_fixed_constraints else 250.0
        groups = self._constraint_groups(only_fixed_constraints)
        # device work runs in the configured dtype (float32 on TPU; tests
        # force float64 via FIRECODE_TPU_DTYPE for oracle parity)
        dtype = np.dtype(os.environ.get("FIRECODE_TPU_DTYPE", "float32"))

        for (sig, ez_sig), indices in groups.items():
            indices = np.asarray(indices)
            indices = indices[~done[indices]]
            if len(indices) == 0:
                continue
            cons = Constraints()
            for i1, i2, target in sig:
                if target is None:
                    target = float(
                        np.linalg.norm(
                            self.structures[indices[0]][i1]
                            - self.structures[indices[0]][i2]
                        )
                    )
                cons.add_distance(i1, i2, target, k=spring_k)
            for quad, phi in ez_sig:
                cons.add_dihedral(quad, phi, k=25.0)
            for c in self.internal_angle_dih_constraints:
                if only_fixed_constraints and not c.fixed:
                    continue
                if c.type_ == "A":
                    cons.add_angle(*c.indices, c.value)
                else:
                    cons.add_dihedral(c.indices, c.value)

            batch = self.structures[indices].astype(dtype)
            result = optimize_batch(
                calc, batch, constraints=cons, fmax=fmax, max_steps=max_steps,
                mesh=self.device_mesh,
            )
            new_coords = np.asarray(result.coords, dtype=np.float64)
            new_energy = np.asarray(result.energy, dtype=np.float64)
            ok = np.asarray(result.converged).copy()

            if self.options.scramble_check and ok.any():
                # one batched device call instead of B host graphize passes
                excluded = np.array([p[:2] for p in sig], dtype=int).ravel()
                unscrambled = scramble_check_batch(
                    self.atomnos,
                    new_coords[ok],
                    excluded_atoms=excluded,
                    mols_graphs=self.graphs,
                    max_newbonds=self.options.max_newbonds,
                )
                ok[np.nonzero(ok)[0][~unscrambled]] = False

            idx = np.asarray(indices)
            self.exit_status[idx] = ok
            self.structures[idx[ok]] = new_coords[ok]
            self.energies[idx[ok]] = new_energy[ok]
            self.energies[idx[~ok]] = 1e10

            # periodic intra-stage snapshot (reference checkpoint cadence,
            # firecode/embedder.py:2213-2240 — but consumable via --resume)
            done[idx] = True
            n_since_save += len(idx)
            if n_since_save >= self.options.checkpoint_frequency and not done.all():
                save_state(self, stage_tag, done=done)
                n_since_save = 0
            if len(groups) > 1:
                from firecode_tpu.profiling import eta_report

                self.log(
                    "    " + eta_report(
                        int(done.sum()), b, time.perf_counter() - t_start
                    )
                )

        elapsed = time.perf_counter() - t_start
        self.log(
            f"{self.options.calculator}/{self.options.theory_level} batched "
            f"optimization of {len(self.structures)} structures took {elapsed:.1f} s "
            f"({elapsed / max(len(self.structures), 1):.3f} s/structure)"
        )
        n_ok = int(self.exit_status.sum())
        self.log(
            f"Successfully optimized {n_ok}/{len(self.structures)} structures. "
            f"Non-optimized ones will {'' if self.options.only_refined else 'not '}be discarded."
        )

        if self.options.only_refined:
            mask = self.exit_status
            self.apply_mask(
                ("structures", "constrained_indices", "energies", "exit_status"), mask
            )

        order = np.argsort(self.energies, kind="stable")
        for attr in ("energies", "structures", "constrained_indices", "exit_status"):
            setattr(self, attr, getattr(self, attr)[order])

        if self.options.kcal_thresh is not None and only_fixed_constraints:
            self.energy_pruning()

        self.fitness_refining(threshold=2)
        self.zero_candidates_check()
        self.similarity_refining()

        self.write_structures(
            "ensemble" if self.embed == "refine" else "poses", energies=True, p=True
        )
        if not only_fixed_constraints:
            self.energies.fill(0)

    def energy_pruning(self) -> None:
        rel = self.rel_energies()
        thr = self.options.kcal_thresh
        if np.count_nonzero(rel < thr) / len(rel) <= 0.1:
            for t in np.sort(rel[rel > thr]):
                if np.count_nonzero(rel < t) / len(rel) > 0.1:
                    thr = float(t)
                    self.log(
                        f"--> Dynamically adjusted energy threshold to {thr:.1f} kcal/mol"
                    )
                    break
        mask = rel < thr
        self.apply_mask(
            ("structures", "constrained_indices", "energies", "exit_status"), mask
        )
        if not mask.all():
            self.log(
                f"Discarded {int((~mask).sum())} candidates for energy "
                f"({int(mask.sum())} left, threshold {thr:.1f} kcal/mol)"
            )

    def vibrational_analysis(self) -> None:
        from firecode_tpu.thermo import get_free_energies

        self.log(
            f"\n--> Frequency calc. / thermochemical analysis "
            f"({self.options.theory_level} via {self.options.calculator})"
        )
        self.energies = get_free_energies(
            calc=self._get_embed_calc(),
            atomnos=self.atomnos,
            structures=self.structures,
            T=self.options.T,
            P=self.options.P,
            C=self.options.C,
            solvent=self.options.solvent,
            logfunction=self.log,
        )
        order = np.argsort(self.energies, kind="stable")
        for attr in ("energies", "structures", "constrained_indices"):
            setattr(self, attr, getattr(self, attr)[order])
        self.write_structures("vib_ensemble", energies=True)

    def dump_status(self, tag: str) -> None:
        """DEBUG artifact: full run-state dump (reference embedder.py:
        1887-1954, minus the pickle — the .npz snapshot is resumable instead).
        Writes structures + energies + constraints + an options summary."""
        from firecode_tpu.driver.checkpoint import save_state

        prefix = f"firecode_debug_{self.stamp}_{tag}"
        if hasattr(self, "structures") and len(getattr(self, "structures", [])):
            with open(f"{prefix}.xyz", "w") as f:
                for i, s in enumerate(self.structures):
                    title = f"Debug dump {tag} - structure {i + 1}"
                    if hasattr(self, "energies") and len(self.energies) == len(
                        self.structures
                    ):
                        title += f" - E = {self.energies[i]:.5f} kcal/mol"
                    write_xyz(f, self.atoms, s, title=title)
            save_state(self, f"debug_{tag}", path=f"{prefix}.npz")
        with open(f"{prefix}_options.txt", "w") as f:
            f.write(self.options.summary() + "\n")
        self.log(f"    DEBUG: dumped run state to {prefix}.*")

    # ----------------------------------------------------------- run

    def run(self) -> None:
        self.write_mol_info()

        if self.embed is None:
            self.log("--> No embed or refinement requested, exiting.\n")
            self.normal_termination()
        if self.embed == "data":
            self.data_termination()

        self.log("--> Calculation options used were:")
        for line in self.options.summary().split("\n"):
            self.log(f"    - {line}")

        if self.options.dryrun:
            self.log("\n--> Dry run requested: exiting.")
            self.normal_termination()

        from firecode_tpu.driver.checkpoint import load_state, save_state
        from firecode_tpu.profiling import profiler

        # --resume: restore a snapshot and skip the stages already completed
        # (the reference writes checkpoints but cannot consume them —
        # firecode/embedder.py:2213-2240; here the round-trip is real)
        resume_stage = None
        if getattr(self, "resume_path", None):
            resume_stage = load_state(self, self.resume_path)
            done = self._resume_done
            self.log(
                f"--> Resuming from {self.resume_path} (stage: {resume_stage}"
                + (f", {int(done.sum())}/{len(done)} structures done)" if done is not None else ")")
            )
        skip = {
            "pre_optimization": 1,
            "optimization_loose": 1,
            "optimization_tight": 2,
            "post_optimization": 3,
        }.get(resume_stage, 0)

        profiler.reset()
        try:
            try:
                if skip == 0:
                    with profiler.timer("generate_candidates"):
                        self.generate_candidates()
                    if self.options.bypass:
                        self.write_structures("unoptimized", energies=False)
                        self.normal_termination()
                    with profiler.timer("compenetration_refining"):
                        self.compenetration_refining()
                    with profiler.timer("similarity_refining"):
                        self.similarity_refining(
                            rmsd=(self.embed == "refine"), verbose=True
                        )
                    save_state(self, "pre_optimization")
                    if self.options.debug:
                        self.dump_status("pre_optimization")
                if self.options.optimization:
                    if skip <= 1 and (
                        len(self.structures) > 500
                        or self.temporary_constraints_present()
                        or resume_stage == "optimization_loose"
                    ):
                        with profiler.timer("optimization_loose"):
                            self.optimization_refining(
                                conv_thr="loose",
                                resume_done=self._resume_done
                                if resume_stage == "optimization_loose"
                                else None,
                            )
                    if skip <= 2:
                        with profiler.timer("optimization_tight"):
                            self.optimization_refining(
                                conv_thr="tight",
                                only_fixed_constraints=True,
                                resume_done=self._resume_done
                                if resume_stage == "optimization_tight"
                                else None,
                            )
                        save_state(self, "post_optimization")
                        if self.options.debug:
                            self.dump_status("post_optimization")
                elif skip == 0:
                    self.write_structures("unoptimized", energies=False)
            except ZeroCandidatesError:
                self.log(
                    "\n--> Program termination: No candidates found.\n"
                    "    Tips: SHRINK or DIST may help the embed; CLASHES relaxes\n"
                    "    rejection criteria; higher STEPS/ROTRANGE makes more candidates."
                )
                self.logfile.close()
                sys.exit(0)

            if self.options.freq:
                with profiler.timer("vibrational_analysis"):
                    self.vibrational_analysis()

            report = profiler.report()
            if report:
                self.log("\n" + report)

            self.normal_termination()

        except KeyboardInterrupt:
            print("\n\nKeyboardInterrupt requested by user. Quitting.")
            sys.exit(1)

    def write_mol_info(self) -> None:
        head = ""
        for i, mol in enumerate(self.objects):
            line = (
                f" -> {mol.n_atoms} atoms, {len(mol.coords)} conformer"
                f"{'s' if len(mol.coords) != 1 else ''}"
            )
            if mol.pivots.get(0):
                line += f", {len(mol.pivots[0])} pivots"
            head += f"\n    {i + 1}. {mol.filename}{line}"
            for idx in mol.reactive_indices:
                atom = mol.reactive_atoms.get(0, {}).get(int(idx))
                desc = repr(atom) if atom else str(mol.atoms[idx])
                head += f"\n        {idx} -> {desc}"
        self.log("--> Input structures & reactive indices data:" + head + "\n")

        if self.pairings_table:
            self.log(
                f"--> Atom pairings imposed: {len(self.pairings_table)} "
                f"{list(self.pairings_table.values())} (cumulative numbering)\n"
            )

    def data_termination(self) -> None:
        if any("pka>" in op for op in self.options.operators):
            self.pka_termination()
        if len([op for op in self.options.operators if "scan>" in op]) > 1:
            self.scan_termination()
        self.normal_termination()

    def pka_termination(self) -> None:
        from firecode_tpu.units import R_KCAL

        self.log("\n--> pKa energetics (from best conformers)")
        for mol in self.objects:
            if getattr(mol, "pka_data", None) is not None:
                process, dg = mol.pka_data
                self.log(f"    {mol.basename}: {process}  dG = {dg:.2f} kcal/mol")
        if self.options.pka_ref is not None:
            ref_name, ref_value = self.options.pka_ref
            dg_ref = next(
                m.pka_data[1]
                for m in self.objects
                if m.filename == ref_name and getattr(m, "pka_data", None)
            )
            for mol in self.objects:
                if getattr(mol, "pka_data", None) is None:
                    continue
                process, dg = mol.pka_data
                ddg = dg - dg_ref if process == "HA -> A-" else dg_ref - dg
                pka = ddg / (np.log(10) * R_KCAL * self.options.T) + ref_value
                self.log(f"    {mol.basename}: pKa = {pka:.2f}")

        # acid + base pair: equilibrium constant of HA + B -> BH+ + A-
        # (reference embedder.py:2941-2955); the proton cancels in the sum
        # of the two stored half-reaction dGs
        with_data = [
            m for m in self.objects if getattr(m, "pka_data", None) is not None
        ]
        if len(with_data) == 2:
            tags = (with_data[0].pka_data[0], with_data[1].pka_data[0])
            if "HA -> A-" in tags and "B -> BH+" in tags:
                dg_eq = with_data[0].pka_data[1] + with_data[1].pka_data[1]
                k_eq = float(np.exp(-dg_eq / (R_KCAL * self.options.T)))
                self.log("\n    Equilibrium data:")
                self.log(
                    f"    HA + B -> BH+ + A-    K({self.options.T:.2f} K) "
                    f"= {k_eq:.3g}    dG = {dg_eq:.3f} kcal/mol"
                )

    def scan_termination(self) -> None:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.figure()
        for mol in self.objects:
            if getattr(mol, "scan_data", None) is not None:
                plt.plot(*mol.scan_data, label=mol.basename)
        plt.legend()
        plt.title("Unified scan energetics")
        plt.xlabel("Distance (A)")
        plt.gca().invert_xaxis()
        plt.ylabel("Rel. E. (kcal/mol)")
        plt.savefig(f"{self.stamp}_cumulative_plt.svg")
        self.log(f"\n--> Written cumulative scan plot at {self.stamp}_cumulative_plt.svg")
