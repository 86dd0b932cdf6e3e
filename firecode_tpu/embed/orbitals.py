"""Reactive-atom pseudo-orbital geometry (host side).

For each user-flagged reactive atom, a set of "orbital lobes" (unit direction
vectors + absolute centers at a characteristic half-bonding distance) is built
from the local bonding geometry. Embedding then connects lobes of different
molecules. Capability parity with the reference's reactive-atom classes
(firecode/reactive_atoms_classes.py:41-783), reimplemented as pure functions
returning a frozen dataclass instead of mutating class instances.

Lobe-building rules by atom code (element + bonded-neighbor count):
- single-bonded halogens/H/C1/N1: one lobe opposite the bond (or three
  staggered sigma* lobes when part of a vicinal reactive pair);
- sp2 centers (C3/N3/B3/P3/S3): two p lobes normal to the plane;
- sp3 centers (C4/N4/P4/S4/B4): one backside lobe anti to the likely leaving
  group (O/N/Cl/Br/I neighbor preferred);
- ethers (O2/S2): two tetrahedral lone-pair lobes;
- terminal O/S (ketone-like): two in-plane n lobes at +-120 deg from the C=O
  axis, two p lobes when conjugated-sigmatropic, four lobes for ketene,
  three ("trilobe") for alkoxide/sulfonamide-like;
- imine N2/P2: one lone-pair lobe (or two p lobes when sigmatropic);
- linear C2: sp with four lobes in the normal plane (oriented by substituents
  for allenes/ketenes); bent C2 = carbene (sp2 lobe + two p lobes);
- metals: four lobes around the first ligand axis;
- isolated atoms: one arbitrary lobe.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

import networkx as nx
import numpy as np


def _normalize(v: np.ndarray) -> np.ndarray:
    return v / max(float(np.linalg.norm(v)), 1e-12)


def _rot(axis: np.ndarray, angle_deg: float) -> np.ndarray:
    theta = np.radians(angle_deg)
    a = _normalize(axis)
    k = np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]])
    return np.eye(3) + np.sin(theta) * k + (1 - np.cos(theta)) * (k @ k)


# characteristic half TS-bonding distance per (element, kind); Angstrom
ORB_DIM: dict[tuple[str, str], float] = {
    ("H", "single"): 0.85,
    ("C", "single"): 1.0,
    ("O", "single"): 1.0,
    ("N", "single"): 1.0,
    ("F", "single"): 1.0,
    ("Cl", "single"): 1.5,
    ("Br", "single"): 1.5,
    ("I", "single"): 2.0,
    ("C", "sp"): 1.0,
    ("N", "sp"): 1.0,
    ("B", "sp2"): 0.8,
    ("C", "sp2"): 1.1,
    ("N", "sp2"): 1.0,
    ("B", "sp3"): 1.0,
    ("C", "sp3"): 1.0,
    ("Br", "sp3"): 1.0,
    ("O", "ether"): 1.0,
    ("S", "ether"): 1.0,
    ("O", "ketone"): 0.85,
    ("S", "ketone"): 1.0,
    ("N", "imine"): 1.0,
    ("C", "carbene"): 1.0,
}
ORB_DIM_METAL = 2.5
ORB_DIM_FALLBACK = 1.0

METALS = (
    "Li", "Na", "Mg", "K", "Ca", "Ti", "Rb", "Sr", "Cs", "Ba", "Zn",
)

LEAVING_GROUP_PRIORITY = ("O", "N", "Cl", "Br", "I")


@dataclass
class ReactiveAtom:
    index: int
    symbol: str
    kind: str  # single/sp2/sp3/ether/ketone/imine/sp/carbene/metal/atom
    subtype: str = ""
    coord: np.ndarray = field(default_factory=lambda: np.zeros(3))
    orb_vecs: np.ndarray = field(default_factory=lambda: np.zeros((0, 3)))  # unit
    centers: np.ndarray = field(default_factory=lambda: np.zeros((0, 3)))  # absolute
    cumnum: int = -1  # cumulative atom index in a multi-molecule assembly
    orb_dim: float = ORB_DIM_FALLBACK
    neighbors_symbols: list[str] = field(default_factory=list)

    def __repr__(self) -> str:
        sub = f" ({self.subtype})" if self.subtype else ""
        return f"{self.symbol}{self.kind}{sub}@{self.index}"

    @property
    def n_lobes(self) -> int:
        return len(self.centers)

    def with_orb_dim(self, orb_dim: float) -> "ReactiveAtom":
        return ReactiveAtom(
            index=self.index,
            symbol=self.symbol,
            kind=self.kind,
            subtype=self.subtype,
            coord=self.coord,
            orb_vecs=self.orb_vecs,
            centers=self.coord + self.orb_vecs * orb_dim,
            cumnum=self.cumnum,
            orb_dim=orb_dim,
            neighbors_symbols=self.neighbors_symbols,
        )


def atom_kind(graph: nx.Graph, index: int, override: str | None = None) -> str:
    """Classify the reactive atom into a lobe-building kind."""
    if override is not None:
        return override
    el = graph.nodes[index]["atoms"]
    nb = list(graph.neighbors(index))
    d = len(nb)
    if d == 0:
        return "atom"
    if el in METALS:
        return "metal"
    code = (el, d)
    table = {
        ("H", 1): "single",
        ("B", 3): "sp2",
        ("B", 4): "sp3",
        ("C", 1): "single",
        ("C", 2): "sp_or_carbene",
        ("C", 3): "sp2",
        ("C", 4): "sp3",
        ("N", 1): "single",
        ("N", 2): "imine",
        ("N", 3): "sp2",
        ("N", 4): "sp3",
        ("O", 1): "ketone",
        ("O", 2): "ether",
        ("P", 2): "imine",
        ("P", 3): "sp2",
        ("P", 4): "sp3",
        ("S", 1): "ketone",
        ("S", 2): "ether",
        ("S", 3): "sp2",
        ("S", 4): "sp3",
        ("F", 1): "single",
        ("Cl", 1): "single",
        ("Br", 1): "single",
        ("I", 1): "single",
    }
    kind = table.get(code)
    if kind is None:
        raise KeyError(f"Orbital type {el}{d} not known (index {index})")
    return kind


def build_reactive_atom(
    graph: nx.Graph,
    coords: np.ndarray,
    index: int,
    reactive_indices: Sequence[int] = (),
    sigmatropic: bool = False,
    sp3_sigmastar: bool = False,
    override: str | None = None,
    orb_dim: float | None = None,
) -> ReactiveAtom:
    """Build the lobe geometry for one reactive atom on one conformer."""
    el = graph.nodes[index]["atoms"]
    kind = atom_kind(graph, index, override)
    nb = list(graph.neighbors(index))
    pos = coords[index]
    others = coords[nb] if nb else np.zeros((0, 3))

    subtype = ""
    if kind == "sp_or_carbene":
        angle = float(
            np.degrees(
                np.arccos(
                    np.clip(
                        _normalize(others[0] - pos) @ _normalize(others[1] - pos), -1, 1
                    )
                )
            )
        )
        kind = "sp" if abs(angle - 180.0) < 5.0 else "carbene"

    vecs = others - pos  # bond vectors

    if kind == "single":
        if sp3_sigmastar:
            orb_vecs = _sigmastar_lobes(graph, coords, index, reactive_indices, nb)
        else:
            orb_vecs = np.array([_normalize(pos - others[0])])

    elif kind == "sp2":
        crosses = [
            np.cross(_normalize(vecs[i]), _normalize(vecs[(i + 1) % len(vecs)]))
            for i in range(len(vecs))
        ]
        p = _normalize(np.mean(crosses, axis=0))
        orb_vecs = np.array([p, -p])

    elif kind == "sp3":
        if sp3_sigmastar:
            orb_vecs = _sigmastar_lobes(graph, coords, index, reactive_indices, nb)
        else:
            symbols = [graph.nodes[n]["atoms"] for n in nb]
            lg_candidates = [k for k, s in enumerate(symbols) if s in LEAVING_GROUP_PRIORITY]
            heavy = [k for k, s in enumerate(symbols) if s != "H"]
            if len(lg_candidates) == 1:
                lg = lg_candidates[0]
            elif len(heavy) == 1:
                lg = heavy[0]
            else:
                lg = 0
            orb_vecs = np.array([_normalize(pos - others[lg])])

    elif kind == "ether":
        v0 = _normalize(vecs[0])
        v1 = _normalize(vecs[1])
        # reflect the two bond vectors into the lone-pair region: rotate the
        # bond pair 180 deg about the plane normal then 90 deg about the
        # bisector (tetrahedral lone pairs)
        orb_mat = _rot(v0 + v1, 90.0) @ _rot(np.cross(v0, v1), 180.0)
        orb_vecs = np.array([orb_mat @ v0, orb_mat @ v1])

    elif kind == "ketone":
        orb_vecs, subtype = _ketone_lobes(graph, coords, index, nb, pos, sigmatropic)

    elif kind == "imine":
        if sigmatropic:
            p = _normalize(np.cross(vecs[0], vecs[1]))
            orb_vecs = np.array([p, -p])
        else:
            orb_vecs = np.array(
                [-_normalize(np.mean([_normalize(v) for v in vecs], axis=0))]
            )

    elif kind == "sp":
        orb_vecs, subtype = _sp_lobes(graph, coords, index, nb, pos, others)

    elif kind == "carbene":
        lone = -_normalize(np.mean([_normalize(v) for v in vecs], axis=0))
        p = _normalize(np.cross(_normalize(vecs[0]), _normalize(vecs[1])))
        orb_vecs = np.array([lone, p, -p])

    elif kind == "metal":
        v1 = vecs[0]
        nb_of_nb = [n for n in graph.neighbors(nb[0]) if n != index]
        v2 = (coords[nb_of_nb[0]] - pos) if nb_of_nb else np.array([0.0, 0.0, 1.0])
        base = _normalize(_rot(np.cross(v1, v2), 120.0) @ v1)
        orb_vecs = np.array([_rot(v1, a) @ base for a in (0.0, 90.0, 180.0, 270.0)])

    else:  # isolated atom
        orb_vecs = np.array([[0.0, 0.0, -1.0]])

    if orb_dim is None:
        key = "carbene" if kind == "carbene" else kind
        if kind == "metal":
            orb_dim = ORB_DIM_METAL
        else:
            orb_dim = ORB_DIM.get((el, key), ORB_DIM_FALLBACK)
        if kind in ("single", "atom") and (el, "single") not in ORB_DIM and nb:
            orb_dim = float(np.linalg.norm(pos - others[0]))

    orb_vecs = np.array([_normalize(v) for v in orb_vecs])
    return ReactiveAtom(
        index=index,
        symbol=el,
        kind=kind,
        subtype=subtype,
        coord=pos.copy(),
        orb_vecs=orb_vecs,
        centers=pos + orb_vecs * orb_dim,
        orb_dim=float(orb_dim),
        neighbors_symbols=[graph.nodes[n]["atoms"] for n in nb],
    )


def _sigmastar_lobes(graph, coords, index, reactive_indices, nb) -> np.ndarray:
    """Three staggered sigma* lobes around the axis to the bonded reactive
    partner (vicinal reactive pairs, BH4/agostic-like)."""
    partner = next(i for i in reactive_indices if i != index and i in nb)
    pos = coords[index]
    pivot = _normalize(coords[partner] - pos)
    partner_nb = [n for n in graph.neighbors(partner) if n != index]
    ref_src = partner_nb[0] if partner_nb else nb[0]
    orb = _normalize(coords[ref_src] - coords[partner])
    orb = orb - (orb @ pivot) * pivot
    return np.array([_rot(pivot, a + 60.0) @ orb for a in (0.0, 120.0, 240.0)])


def _ketone_lobes(graph, coords, index, nb, pos, sigmatropic) -> tuple[np.ndarray, str]:
    carbon = nb[0]
    vector = _normalize(coords[carbon] - pos)
    nb_of_nb = [n for n in graph.neighbors(carbon) if n != index]

    if len(nb_of_nb) == 1:
        # ketene O=C=C
        ket_c = nb_of_nb[0]
        subs = [n for n in graph.neighbors(ket_c) if n != carbon]
        v = coords[subs[0]] - coords[ket_c] if subs else np.array([1.0, 0.0, 0.0])
        pointer = _normalize(v - (v @ vector) * vector)
        return (
            np.array([_rot(vector, 90.0 * s) @ pointer for s in range(4)]),
            "p+p",
        )

    if len(nb_of_nb) == 2:
        a1 = coords[nb_of_nb[0]]
        a2 = coords[nb_of_nb[1]]
        p = _normalize(np.cross(a1 - pos, a2 - pos))
        if sigmatropic:
            return np.array([p, -p]), "p"
        return (
            np.array([_rot(p, a) @ vector for a in (120.0, 240.0)]),
            "sp2",
        )

    # alkoxide/sulfonamide-like: reflect the three beta substituent directions
    v123 = [_normalize(coords[n] - pos) for n in nb_of_nb[:3]]
    p = _normalize(np.cross(vector, v123[0]))
    return np.array([_rot(p, 180.0) @ v for v in v123]), "trilobe"


def _sp_lobes(graph, coords, index, nb, pos, others) -> tuple[np.ndarray, str]:
    symbols = [graph.nodes[n]["atoms"] for n in nb]
    axis_vec = others[0] - pos
    subtype = "sp"

    nb_of_nb = [
        [n for n in graph.neighbors(nb[0]) if n != index],
        [n for n in graph.neighbors(nb[1]) if n != index],
    ]
    allene = all(s == "C" for s in symbols) and all(len(x) == 2 for x in nb_of_nb)
    ketene = sorted(symbols) in (["C", "O"], ["C", "S"])

    rng = np.random.default_rng(0)
    v = rng.random(3)
    pivot1 = v - (v @ _normalize(axis_vec)) * axis_vec
    if allene or ketene:
        axis = _normalize(others[0] - others[1])
        side = 0 if len(nb_of_nb[0]) == 2 else 1
        if nb_of_nb[side]:
            ref = coords[nb_of_nb[side][0]] - coords[nb[side]]
            pivot1 = ref - (ref @ axis) * axis
            subtype = "allene" if allene else "ketene"
    pivot2 = _normalize(np.cross(pivot1, axis_vec))
    base = _normalize(axis_vec)
    return (
        np.array(
            [_rot(pivot2, 90.0) @ _rot(pivot1, a) @ base for a in (0.0, 90.0, 180.0, 270.0)]
        ),
        subtype,
    )
