"""Input-language keywords and run options.

Same keyword surface as the reference (firecode/embedder_options.py:40-108):
priority-ordered execution, typo suggestions, parenthesized sub-arguments.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

# keyword -> priority (1 runs first)
KEYWORDS: dict[str, int] = {
    "BYPASS": 1,
    "C": 1,
    "CALC": 1,
    "CHARGE": 1,
    "CONFS": 1,
    "CONC": 1,
    "CLASHES": 1,
    "NCI": 1,
    "CRESTLEVEL": 1,
    "DEEP": 1,
    "DEBUG": 1,
    "DIST": 2,
    "DRYRUN": 1,
    "EZPROT": 1,
    "FFOPT": 1,
    "FREQ": 1,
    "IMAGES": 1,
    "KCAL": 1,
    "LET": 1,
    "LEVEL": 1,
    "MULT": 1,
    "NEB": 2,
    "NEWBONDS": 1,
    "NOOPT": 1,
    "ONLYREFINED": 1,
    "P": 1,
    "PKA": 1,
    "REFINE": 1,
    "RMSD": 1,
    "ROTRANGE": 1,
    "SCRAMBLECHECK": 1,
    "SHRINK": 1,
    "SIMPLEORBITALS": 1,
    "SOLVENT": 1,
    "STEPS": 1,
    "SUPRAFAC": 1,
    "T": 1,
    "T_C": 1,
}


def keyword_suggestion(unknown: str) -> str | None:
    """Closest known keyword by a simple letter-overlap score."""

    def score(ref: str, kw: str) -> float:
        seen: set[str] = set()
        total = 0
        for ch in kw:
            if ch not in seen:
                total += ref.count(ch)
                seen.add(ch)
        # normalize by the longer string so short keywords don't win ties
        return total / max(len(ref), len(kw))

    best = max(KEYWORDS, key=lambda k: score(k, unknown))
    return best if score(best, unknown) > 0.5 else None


@dataclass
class NEBOptions:
    n_images: int = 7
    preopt: bool = True
    climbing_image: bool = True
    pairs: bool = False  # >=4 even frames = reagent/product pairs (batched)

    def __bool__(self) -> bool:
        return True


@dataclass
class Options:
    rotation_range: int = 45
    rotation_steps: int | None = None
    custom_rotation_steps: int | None = None

    rmsd: float = 0.5
    rigid: bool = False
    max_confs: int = 1000

    max_clashes: int = 0
    clash_thresh: float = 1.5
    max_newbonds: int = 0

    optimization: bool = True
    ff_opt: bool = True
    freq: bool = False
    calculator: str = field(
        default_factory=lambda: os.environ.get("FIRECODE_TPU_CALCULATOR", "GFNFF")
    )
    theory_level: str | None = None
    solvent: str | None = None
    scramble_check: bool = False
    charge: int = 0
    mult: int = 1
    T: float = 298.15
    P: float | None = None
    C: float = 0.1

    nci: bool = False
    crestlevel: str | None = None
    shrink: bool = False
    shrink_multiplier: float = 1.0
    suprafacial: bool = False
    simpleorbitals: bool = False
    only_refined: bool = False
    double_bond_protection: bool = False
    keep_hb: bool = False
    dryrun: bool = False
    checkpoint_frequency: int = field(
        default_factory=lambda: int(os.environ.get("FIRECODE_TPU_CHECKPOINT_FREQ", "50"))
    )
    images: int | None = None
    fix_angles_in_deformation: bool = False

    kcal_thresh: float = 10.0
    pka_ref: tuple[str, float] | None = None
    bypass: bool = False
    debug: bool = False
    let: bool = False
    noembed: bool = False

    neb: NEBOptions | None = None

    operators: list[str] = field(default_factory=list)
    operators_dict: dict[int, list[str]] = field(default_factory=dict)

    def summary(self) -> str:
        skip_if_false = {
            "bypass", "nci", "debug", "let", "freq", "noembed", "keep_hb",
            "dryrun", "shrink", "rigid", "scramble_check", "suprafacial",
            "simpleorbitals", "fix_angles_in_deformation",
            "double_bond_protection", "operators",
        }
        items = []
        for key, value in sorted(vars(self).items()):
            if key.startswith("_") or key == "operators_dict":
                continue
            if key in skip_if_false and not value:
                continue
            if value is None:
                continue
            items.append((key, value))
        pad = 1 + max(len(k) for k, _ in items)
        return "\n".join(f"{k:<{pad}}: {v}" for k, v in items)


class OptionSetter:
    """Parses the keyword line and applies keyword effects in priority order."""

    def __init__(self, embedder) -> None:
        self.embedder = embedder
        kw_line = getattr(embedder, "kw_line", "") or ""
        words = kw_line.split()
        self.keywords = [
            w.split("=")[0].upper() if "(" not in w else w.split("(")[0].upper() for w in words
        ]
        self.raw = {k: w.upper() for k, w in zip(self.keywords, words)}
        self.raw_cs = {k: w for k, w in zip(self.keywords, words)}

        for k in self.keywords:
            if k not in KEYWORDS:
                guess = keyword_suggestion(k)
                extra = "" if guess is None else f' Did you mean "{guess}"?'
                raise SyntaxError(f'Keyword "{k}" was not understood.{extra}')

    def sorted_keywords(self) -> list[str]:
        return sorted(self.keywords, key=lambda kw: KEYWORDS.get(kw, 3))

    def set_options(self) -> None:
        options = self.embedder.options
        for kw in self.sorted_keywords():
            getattr(self, kw.lower())(options)
        if any("refine>" in op for op in options.operators) or options.noembed:
            self._refine_routine()

    def _refine_routine(self) -> None:
        emb = self.embedder
        if len(emb.objects) > 1:
            raise SystemExit(
                "The refine> operator / REFINE keyword needs exactly one "
                f"multimolecular .xyz file per run ({len(emb.objects)} found)."
            )
        emb.options.noembed = True
        emb.objects[0].compute_orbitals(
            override="single" if emb.options.simpleorbitals else None
        )
        emb.set_structures_from_mol()

    # ---- keyword effects (names must match lowercased keywords) ----

    def _value(self, kw: str) -> str:
        return self.raw[kw].split("=")[1]

    def bypass(self, o):
        o.bypass = True
        o.optimization = False

    def charge(self, o):
        o.charge = int(self._value("CHARGE"))

    def mult(self, o):
        o.mult = int(self._value("MULT"))

    def confs(self, o):
        o.max_confs = int(self._value("CONFS"))

    def nci(self, o):
        o.nci = True

    def crestlevel(self, o):
        o.crestlevel = self._value("CRESTLEVEL")

    def dryrun(self, o):
        o.dryrun = True

    def suprafac(self, o):
        o.suprafacial = True

    def deep(self, o):
        o.rmsd = 0.1
        o.rotation_steps = 72
        o.max_clashes = 1
        o.clash_thresh = 1.4

    def rotrange(self, o):
        o.rotation_range = int(self._value("ROTRANGE"))

    def steps(self, o):
        o.custom_rotation_steps = int(self._value("STEPS"))

    def rmsd(self, o):
        o.rmsd = float(self._value("RMSD"))

    def noopt(self, o):
        o.optimization = False

    def ffopt(self, o):
        o.ff_opt = self._value("FFOPT") == "ON"

    def images(self, o):
        o.images = int(self._value("IMAGES"))

    def dist(self, o):
        raw = self.raw_cs["DIST"]
        orb_string = raw[5:-1].replace(" ", "")
        self.embedder.set_custom_orbs(orb_string)

    def clashes(self, o):
        raw = self.raw["CLASHES"]
        body = raw[8:-1].lower().replace(" ", "")
        for piece in body.split(","):
            name, value = piece.split("=")
            if name == "num":
                o.max_clashes = int(value)
            elif name == "dist":
                o.clash_thresh = float(value)
            else:
                raise SyntaxError(
                    f"CLASHES syntax error: {body!r}. Use CLASHES(num=3,dist=1.2)"
                )

    def newbonds(self, o):
        o.max_newbonds = int(self._value("NEWBONDS"))

    def neb(self, o):
        o.neb = NEBOptions(n_images=o.images or 7)
        raw = self.raw["NEB"]
        if "(" in raw:
            body = raw[4:-1].lower().replace(" ", "")
            for piece in body.split(","):
                if not piece:
                    continue
                if piece == "pairs":
                    # multi-frame inputs = reagent/product pairs run as a
                    # batched multi-band NEB (extension; the default for >3
                    # frames is the reference's MEP-guess interpretation)
                    o.neb.pairs = True
                    continue
                name, _, value = piece.partition("=")
                flags = {"true": True, "false": False}
                if name == "images" and value:
                    o.neb.n_images = int(value)
                elif name == "preopt" and value in flags:
                    o.neb.preopt = flags[value]
                elif name == "ci" and value in flags:
                    o.neb.climbing_image = flags[value]
                elif name == "pairs" and value in flags:
                    o.neb.pairs = flags[value]
                else:
                    raise SyntaxError(
                        f"NEB syntax error: {body!r}. "
                        "Use NEB(images=7,preopt=true,ci=false,pairs)"
                    )

    def level(self, o):
        o.theory_level = self._value("LEVEL").upper().replace("_", " ")

    def onlyrefined(self, o):
        o.only_refined = True

    def let(self, o):
        o.let = True

    def simpleorbitals(self, o):
        o.simpleorbitals = True

    def kcal(self, o):
        o.kcal_thresh = float(self._value("KCAL"))

    def shrink(self, o):
        o.shrink = True
        parts = self.raw["SHRINK"].split("=")
        o.shrink_multiplier = float(parts[1]) if len(parts) > 1 else 1.5

    def debug(self, o):
        o.debug = True

    def ezprot(self, o):
        o.double_bond_protection = True

    def calc(self, o):
        o.calculator = self._value("CALC")

    def solvent(self, o):
        from firecode_tpu.solvents import solvent_synonyms

        name = self._value("SOLVENT").lower()
        o.solvent = solvent_synonyms.get(name, name)

    def pka(self, o):
        raw = self.raw_cs["PKA"]
        head, value = raw.split("=")
        molname = head[4:-1].replace(" ", "")
        if molname in [m.filename for m in self.embedder.objects] and any(
            f"pka>{molname}" in op.replace(" ", "") for op in o.operators
        ):
            o.pka_ref = (molname, float(value))
            return
        raise SyntaxError(
            f"{molname} must appear in the molecule lines with the pka> operator. "
            "Syntax: PKA(mol.xyz)=n"
        )

    def scramblecheck(self, o):
        o.scramble_check = True

    def refine(self, o):
        o.noembed = True

    def freq(self, o):
        o.freq = True

    def t(self, o):
        o.T = float(self._value("T"))

    def t_c(self, o):
        o.T = float(self._value("T_C")) + 273.15

    def p(self, o):
        o.P = float(self._value("P"))

    def c(self, o):
        o.C = float(self._value("C"))

    def conc(self, o):
        o.C = float(self._value("CONC"))
