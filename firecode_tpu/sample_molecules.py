"""Programmatic sample molecules (no external geometry files).

Used by tests, the benchmark, and the driver entry points; geometries are
idealized (standard bond lengths, tetrahedral angles) and relax cleanly under
the LiteFF calculator.
"""

from __future__ import annotations

import numpy as np

CC = 1.54
CH = 1.09
TET = np.radians(109.47)


def build_alkane(n_carbons: int) -> tuple[np.ndarray, np.ndarray]:
    """(atomnos, coords) for an all-anti n-alkane with tetrahedral-ish H."""
    assert n_carbons >= 2
    # zig-zag backbone in the xz plane
    carbons = [np.zeros(3)]
    step_x = CC * np.sin(TET / 2)
    step_z = CC * np.cos(TET / 2)
    for i in range(1, n_carbons):
        carbons.append(
            carbons[-1] + np.array([step_x, 0.0, step_z * (1 if i % 2 else -1)])
        )
    carbons = np.stack(carbons)

    coords = [c for c in carbons]
    atomnos = [6] * n_carbons

    def add_h(pos):
        coords.append(pos)
        atomnos.append(1)

    for i in range(n_carbons):
        nbrs = []
        if i > 0:
            nbrs.append(carbons[i - 1])
        if i < n_carbons - 1:
            nbrs.append(carbons[i + 1])
        c = carbons[i]
        if len(nbrs) == 2:
            # two H perpendicular to the C-C-C plane
            v1 = nbrs[0] - c
            v2 = nbrs[1] - c
            bisector = -(v1 + v2)
            bisector /= np.linalg.norm(bisector)
            perp = np.cross(v1, v2)
            perp /= np.linalg.norm(perp)
            half = np.radians(109.47 / 2)
            add_h(c + CH * (np.cos(half) * bisector + np.sin(half) * perp))
            add_h(c + CH * (np.cos(half) * bisector - np.sin(half) * perp))
        else:
            # terminal: three H completing the tetrahedron
            v = nbrs[0] - c
            v /= np.linalg.norm(v)
            # build perpendicular frame
            a = np.array([1.0, 0.0, 0.0])
            if abs(v @ a) > 0.9:
                a = np.array([0.0, 1.0, 0.0])
            e1 = np.cross(v, a)
            e1 /= np.linalg.norm(e1)
            e2 = np.cross(v, e1)
            for k in range(3):
                ang = 2 * np.pi * k / 3
                direction = -np.cos(np.pi - TET) * (-v) + np.sin(np.pi - TET) * (
                    np.cos(ang) * e1 + np.sin(ang) * e2
                )
                direction /= np.linalg.norm(direction)
                add_h(c + CH * direction)

    return np.array(atomnos, dtype=np.int32), np.stack(coords)


def build_ethanol() -> tuple[np.ndarray, np.ndarray]:
    """CH3-CH2-OH with reasonable geometry."""
    atomnos, coords = build_alkane(3)
    # turn the third carbon into O: drop two of its hydrogens
    # alkane(3) layout: C0 C1 C2 then H(C0) x3? -> order: C's then H's per C
    # indices: 0,1,2 = C; 3,4 = H(C1 center? ) -- rebuild explicitly instead
    c0 = np.zeros(3)
    c1 = np.array([1.26, 0.0, 0.89])
    o = np.array([2.52, 0.0, 0.0])
    h_o = o + np.array([0.55, 0.0, -0.79])
    hs0 = [
        c0 + np.array([-0.63, 0.89, 0.25]),
        c0 + np.array([-0.63, -0.89, 0.25]),
        c0 + np.array([0.4, 0.0, -1.0]),
    ]
    hs1 = [
        c1 + np.array([0.0, 0.89, 0.63]),
        c1 + np.array([0.0, -0.89, 0.63]),
    ]
    coords = np.stack([c0, c1, o, h_o, *hs0, *hs1])
    atomnos = np.array([6, 6, 8, 1, 1, 1, 1, 1, 1], dtype=np.int32)
    return atomnos, coords
