"""Embedded literature-truth fixtures for native-calculator validation.

Small-molecule reference geometries (experimental r_e/r_0 structures) and
literature energetics (CCSD(T)/CBS or experimental): torsion barriers,
H-bonded dimer binding energies. These are the external anchors that the
in-repo GFN-FF fit trains against (fit.py) and that tests/test_accuracy.py
asserts error bounds on — numbers that fail when the physics regresses
(VERDICT r2 items 1 & 3; mirrors the reference's real-calculator test
philosophy, /root/reference/firecode/tests/test_suite.py:53-70).

Literature values (kcal/mol, Angstrom, degrees):
- ethane torsion barrier 2.9 (Pitzer), butane anti->gauche ~0.6-0.9 and
  syn barrier ~5-6 (Herrebout et al.), ethylene pi twist ~65 (kinetics of
  cis/trans isomerization)
- water dimer De 5.0 (Klopper et al. CCSD(T)/CBS), O...O 2.91
- formic acid cyclic dimer De ~18.6 (CCSD(T)/CBS estimates 16-19)
- equilibrium geometries from NIST CCCBDB experimental tables
"""

from __future__ import annotations

import numpy as np

D = np.radians


def _rot2(v, ang):
    c, s = np.cos(ang), np.sin(ang)
    return np.array([c * v[0] - s * v[1], s * v[0] + c * v[1], 0.0])


def water() -> tuple[np.ndarray, np.ndarray]:
    r, th = 0.9572, D(104.52)
    return np.array([8, 1, 1]), np.array(
        [[0, 0, 0], [r, 0, 0], [r * np.cos(th), r * np.sin(th), 0]]
    )


def ammonia() -> tuple[np.ndarray, np.ndarray]:
    r, hnh = 1.012, D(106.7)
    cos_b2 = (1.0 + 2.0 * np.cos(hnh)) / 3.0  # cos^2(beta) from HNH
    beta = np.arccos(np.sqrt(max(cos_b2, 0.0)))
    hs = [
        [
            r * np.sin(beta) * np.cos(D(120 * k)),
            r * np.sin(beta) * np.sin(D(120 * k)),
            r * np.cos(beta),
        ]
        for k in range(3)
    ]
    return np.array([7, 1, 1, 1]), np.array([[0, 0, 0]] + hs)


def methane() -> tuple[np.ndarray, np.ndarray]:
    r = 1.087 / np.sqrt(3.0)
    dirs = np.array([[1, 1, 1], [1, -1, -1], [-1, 1, -1], [-1, -1, 1]], float)
    return np.array([6, 1, 1, 1, 1]), np.vstack([[0, 0, 0], r * dirs])


def _methyl(c, axis, ref_perp, r_ch=1.091, tilt=D(111.2), offset=0.0):
    """Three H around carbon `c`; `axis` points toward the bonded neighbor,
    each C-H makes the `tilt` angle with it (staggered phase via offset)."""
    axis = axis / np.linalg.norm(axis)
    u = ref_perp - axis * (ref_perp @ axis)
    u = u / np.linalg.norm(u)
    v = np.cross(axis, u)
    out = []
    for k in range(3):
        ang = offset + 2 * np.pi * k / 3
        d = np.cos(tilt) * axis + np.sin(tilt) * (np.cos(ang) * u + np.sin(ang) * v)
        out.append(c + r_ch * d)
    return out


def ethane() -> tuple[np.ndarray, np.ndarray]:
    rcc = 1.536
    c0 = np.zeros(3)
    c1 = np.array([rcc, 0, 0])
    x = np.array([1.0, 0, 0])
    h0 = _methyl(c0, x, np.array([0, 1.0, 0]), offset=0.0)
    h1 = _methyl(c1, -x, np.array([0, 1.0, 0]), offset=D(60))
    return np.array([6, 6, 1, 1, 1, 1, 1, 1]), np.vstack([c0, c1, *h0, *h1])


def ethylene() -> tuple[np.ndarray, np.ndarray]:
    rcc, rch, a = 1.339, 1.086, D(121.3)
    c0 = np.zeros(3)
    c1 = np.array([rcc, 0, 0])
    hs = [
        c0 + rch * np.array([np.cos(a), np.sin(a), 0]),
        c0 + rch * np.array([np.cos(a), -np.sin(a), 0]),
        c1 + rch * np.array([-np.cos(a), np.sin(a), 0]),
        c1 + rch * np.array([-np.cos(a), -np.sin(a), 0]),
    ]
    return np.array([6, 6, 1, 1, 1, 1]), np.vstack([c0, c1, *hs])


def formaldehyde() -> tuple[np.ndarray, np.ndarray]:
    rco, rch, hch = 1.205, 1.111, D(116.2)
    c = np.zeros(3)
    o = np.array([rco, 0, 0])
    h1 = c + rch * np.array([np.cos(np.pi - hch / 2), np.sin(np.pi - hch / 2), 0])
    h2 = c + rch * np.array([np.cos(np.pi - hch / 2), -np.sin(np.pi - hch / 2), 0])
    return np.array([6, 8, 1, 1]), np.vstack([c, o, h1, h2])


def methanol() -> tuple[np.ndarray, np.ndarray]:
    rco, roh, coh = 1.427, 0.956, D(108.5)
    c = np.zeros(3)
    o = np.array([rco, 0, 0])
    # O-H in the xy plane making the COH angle with the O->C (-x) direction
    h_o = o + roh * np.array([-np.cos(coh), np.sin(coh), 0.0])
    hs = _methyl(c, np.array([1.0, 0, 0]), np.array([0, 1.0, 0]),
                 r_ch=1.094, tilt=D(110.0), offset=D(60))
    return np.array([6, 8, 1, 1, 1, 1]), np.vstack([c, o, h_o, *hs])


def butane(anti: bool = True) -> tuple[np.ndarray, np.ndarray]:
    rcc, ccc = 1.533, D(112.8)
    # backbone in the xz plane (anti)
    c = [np.zeros(3)]
    d = np.array([1.0, 0, 0])
    up = True
    for _ in range(3):
        ang = (np.pi - ccc) if up else -(np.pi - ccc)
        d = _rot2(d, ang)
        c.append(c[-1] + rcc * d)
        up = not up
    c = np.array(c)
    coords = [*c]
    z = [6, 6, 6, 6]
    # methyl ends
    for ci, cj, off in ((0, 1, 0.0), (3, 2, 0.0)):
        axis = c[cj] - c[ci]
        coords += _methyl(c[ci], axis, np.array([0, 1.0, 0]), offset=off)
        z += [1, 1, 1]
    # methylene hydrogens (perpendicular to the backbone plane)
    for ci, cl, cr in ((1, 0, 2), (2, 1, 3)):
        bis = -((c[cl] - c[ci]) + (c[cr] - c[ci]))
        bis /= np.linalg.norm(bis)
        perp = np.cross(c[cr] - c[ci], c[cl] - c[ci])
        perp /= np.linalg.norm(perp)
        hh = D(107.0) / 2
        coords.append(c[ci] + 1.093 * (np.cos(hh) * bis + np.sin(hh) * perp))
        coords.append(c[ci] + 1.093 * (np.cos(hh) * bis - np.sin(hh) * perp))
        z += [1, 1]
    return np.array(z), np.vstack(coords)


def methane_dimer() -> tuple[np.ndarray, np.ndarray]:
    """D3d dimer, C...C 3.63 A, De ~0.53 kcal/mol (CCSD(T)/CBS) — the
    dispersion anchor (nothing else in the fixture set is London-bound)."""
    z1, x1 = methane()
    x2 = -x1 + np.array([3.63, 0, 0])
    return np.concatenate([z1, z1]), np.vstack([x1, x2])


def water_dimer() -> tuple[np.ndarray, np.ndarray]:
    """Cs global minimum: near-linear O-H...O, O...O 2.912 A."""
    za, xa = water()
    # acceptor: O at origin, both H pointing away from +x
    th = D(104.52)
    xa = np.array(
        [
            [0, 0, 0],
            [-0.9572 * np.cos(th / 2), 0.9572 * np.sin(th / 2), 0],
            [-0.9572 * np.cos(th / 2), -0.9572 * np.sin(th / 2), 0],
        ]
    )
    # donor: O on +x, one H pointing straight at the acceptor O
    od = np.array([2.912, 0, 0])
    h1 = od + 0.9572 * np.array([-1.0, 0, 0])
    h2 = od + 0.9572 * np.array([np.cos(th), np.sin(th), 0])
    return np.array([8, 1, 1, 8, 1, 1]), np.vstack([xa, od, h1, h2])


def formic_acid() -> tuple[np.ndarray, np.ndarray]:
    """Syn (Z) conformer, experimental-ish geometry."""
    c = np.zeros(3)
    o_d = np.array([1.202, 0, 0])  # C=O
    o_s = 1.343 * np.array([np.cos(D(124.9)), np.sin(D(124.9)), 0])  # C-O
    h_c = 1.097 * np.array([np.cos(D(-111.0)), np.sin(D(-111.0)), 0])
    # O-H: from O_s, angle COH 106.3, H on the C=O side (syn conformer);
    # of the two in-plane choices pick the one closer to the carbonyl O
    oc = (c - o_s) / np.linalg.norm(c - o_s)
    cand = [o_s + 0.972 * _rot2(oc, s * D(106.3)) for s in (+1.0, -1.0)]
    h_o = min(cand, key=lambda h: np.linalg.norm(h - o_d))
    z = np.array([6, 8, 8, 1, 1])
    return z, np.vstack([c, o_d, o_s, h_c, h_o])


def formic_acid_dimer() -> tuple[np.ndarray, np.ndarray]:
    """C2h cyclic dimer via point inversion: two O-H...O=C bridges."""
    z1, x1 = formic_acid()
    h_o = x1[4]
    o_s = x1[2]
    u = (h_o - o_s) / np.linalg.norm(h_o - o_s)
    # inversion center placed so H...O=C ~ 1.70 A along the O-H direction
    center = 0.5 * (h_o + 1.70 * u + x1[1])
    x2 = 2 * center - x1
    return np.concatenate([z1, z1]), np.vstack([x1, x2])


def acetic_acid() -> tuple[np.ndarray, np.ndarray]:
    """Acetic acid (syn): formic acid's C-H replaced by a methyl group.

    Atom order [C, O_d, O_s, H_O, C_me, 3xH]: the acidic hydrogen is
    index 3 (pKa-workflow ion fixtures)."""
    z_f, x_f = formic_acid()
    c, h_c = x_f[0], x_f[3]
    axis = (h_c - c) / np.linalg.norm(h_c - c)
    cm = c + 1.503 * axis
    hs = _methyl(cm, axis, np.array([0, 0, 1.0]), r_ch=1.092)
    z = np.array([6, 8, 8, 1, 6, 1, 1, 1])
    return z, np.vstack([x_f[0], x_f[1], x_f[2], x_f[4], cm, *hs])


def methyl_formate() -> tuple[np.ndarray, np.ndarray]:
    """Methyl formate HCOOCH3 (Z conformer): formic acid's acidic H
    replaced by a methyl group — the ESTER fixture (microwave r_s: C=O
    1.200, C-O 1.334, O-CH3 1.437; Curl 1959).

    Atom order [C, O_d, O_s, H_C, C_me, 3xH]."""
    z_f, x_f = formic_acid()  # [C, O_d, O_s, H_c, H_o]
    o_s, h_o = x_f[2], x_f[4]
    axis = (h_o - o_s) / np.linalg.norm(h_o - o_s)
    cm = o_s + 1.437 * axis
    hs = _methyl(cm, axis, np.array([0, 0, 1.0]), r_ch=1.086)
    z = np.array([6, 8, 8, 1, 6, 1, 1, 1])
    return z, np.vstack([x_f[0], x_f[1], x_f[2], x_f[3], cm, *hs])


def dimethylamine() -> tuple[np.ndarray, np.ndarray]:
    """(CH3)2NH — the SECONDARY amine fixture (ED/microwave: C-N 1.462,
    CNC 112.2; Wollrab & Laurie 1968).

    Atom order [N, C, C, H_N, 3xH, 3xH]: the basic nitrogen is index 0."""
    n = np.zeros(3)
    cnc = D(112.2)
    c1 = 1.462 * np.array([np.cos(cnc / 2), np.sin(cnc / 2), 0.0])
    c2 = 1.462 * np.array([np.cos(cnc / 2), -np.sin(cnc / 2), 0.0])
    # N-H out of the CNC plane (pyramidal N)
    h_n = n + 1.019 * np.array([-0.55, 0.0, 0.835])
    hs1 = _methyl(c1, (n - c1), np.array([0, 0, 1.0]), r_ch=1.094, offset=D(60))
    hs2 = _methyl(c2, (n - c2), np.array([0, 0, 1.0]), r_ch=1.094, offset=D(60))
    z = np.array([7, 6, 6, 1, 1, 1, 1, 1, 1, 1])
    return z, np.vstack([n, c1, c2, h_n, *hs1, *hs2])


def ammonium_water() -> tuple[np.ndarray, np.ndarray]:
    """NH4+ ... OH2 — the CHARGED hydrogen-bond fixture (N...O 2.85 A,
    linear N-H...O; De ~ 20.6 kcal/mol, CCSD(T)/CBS; exp dH298 -19.9,
    Meot-Ner). Total charge +1; the pKa-workflow site is the NH4 fragment
    (atoms 0-4).

    Atom order [N, 4xH_N, O, 2xH_W]."""
    n = np.zeros(3)
    r_nh = 1.027
    dirs = np.array([[1, 1, 1], [1, -1, -1], [-1, 1, -1], [-1, -1, 1]], float)
    dirs /= np.sqrt(3.0)
    hs = n + r_nh * dirs
    # acceptor water O on the first N-H axis at N...O 2.85
    o = n + 2.85 * dirs[0]
    th = D(104.52)
    # water H's straddling the O, pointing away from the donor
    perp = np.cross(dirs[0], [0.0, 0.0, 1.0])
    perp /= np.linalg.norm(perp)
    hw1 = o + 0.9572 * (np.cos(th / 2) * dirs[0] + np.sin(th / 2) * perp)
    hw2 = o + 0.9572 * (np.cos(th / 2) * dirs[0] - np.sin(th / 2) * perp)
    z = np.array([7, 1, 1, 1, 1, 8, 1, 1])
    return z, np.vstack([n, *hs, o, hw1, hw2])


def hydroxide_water() -> tuple[np.ndarray, np.ndarray]:
    """HO- ... H2O — the anion-ACCEPTOR charged hydrogen bond (O...O
    2.47-2.5 A; De ~ 26.7 kcal/mol CCSD(T)/CBS). Total charge -1; the
    charge site is the hydroxide fragment (atoms 0-1).

    Atom order [O_hyd, H_hyd, O_w, H_donor, H_w]."""
    o1 = np.zeros(3)
    h1 = o1 + 0.964 * np.array([-1.0, 0.0, 0.0])
    o2 = o1 + 2.50 * np.array([1.0, 0.0, 0.0])
    # donor H on the O2->O1 axis (near-linear O-H...O)
    hd = o2 + 1.0 * np.array([-1.0, 0.0, 0.0])
    th = D(104.5)
    # spectator H at the water angle from the donor O-H axis ([-1,0,0])
    hw = o2 + 0.9572 * (np.cos(th) * np.array([-1.0, 0.0, 0.0])
                        + np.sin(th) * np.array([0.0, 1.0, 0.0]))
    z = np.array([8, 1, 8, 1, 1])
    return z, np.vstack([o1, h1, o2, hd, hw])


def ethanol() -> tuple[np.ndarray, np.ndarray]:
    """Ethanol (anti): methanol with one methyl H replaced by CH3.

    Atom order [C, O, H_O, 2xH, C_me, 3xH]: the acidic hydrogen is
    index 2."""
    z_m, x_m = methanol()  # [C, O, H_O, 3xH_C]
    c, h3 = x_m[0], x_m[3]
    axis = (h3 - c) / np.linalg.norm(h3 - c)
    cm = c + 1.515 * axis
    hs = _methyl(cm, axis, np.array([0, 0, 1.0]), r_ch=1.092)
    z = np.array([6, 8, 1, 1, 1, 6, 1, 1, 1])
    return z, np.vstack([x_m[0], x_m[1], x_m[2], x_m[4], x_m[5], cm, *hs])


def methylamine() -> tuple[np.ndarray, np.ndarray]:
    """CH3-NH2 (microwave-ish: C-N 1.471, N-H 1.010, C-H 1.093).

    Atom order [C, N, 3xH_C, 2xH_N]: the basic nitrogen is index 1
    (pKa-workflow protonation fixture)."""
    c = np.zeros(3)
    n = np.array([1.471, 0, 0])
    hs_c = _methyl(c, np.array([1.0, 0, 0]), np.array([0, 1.0, 0]),
                   r_ch=1.093, tilt=D(110.0), offset=D(60))
    th, phi = D(112.0), D(61.0)
    h1 = n + 1.010 * np.array([np.cos(th), np.sin(th) * np.cos(phi),
                               np.sin(th) * np.sin(phi)])
    h2 = n + 1.010 * np.array([np.cos(th), np.sin(th) * np.cos(phi),
                               -np.sin(th) * np.sin(phi)])
    return np.array([6, 7, 1, 1, 1, 1, 1]), np.vstack([c, n, *hs_c, h1, h2])


def formamide() -> tuple[np.ndarray, np.ndarray]:
    """Planar formamide (microwave geometry, approx): the amide-bond
    fixture. C-N 1.352 carries ~0.5-0.6 pi bond order; rotation barrier
    (exp, relaxed) 16-18 kcal/mol."""
    rco, rcn, rch, rnh = 1.219, 1.352, 1.098, 1.002
    x = np.array([
        [0.0, 0.0, 0.0],
        [rco * np.cos(np.radians(125)), rco * np.sin(np.radians(125)), 0.0],
        [rcn, 0.0, 0.0],
        [rch * np.cos(np.radians(-115)), rch * np.sin(np.radians(-115)), 0.0],
        [rcn + rnh * np.cos(np.radians(60)), rnh * np.sin(np.radians(60)), 0.0],
        [rcn + rnh * np.cos(np.radians(-60)), rnh * np.sin(np.radians(-60)), 0.0],
    ])
    return np.array([6, 8, 7, 1, 1, 1]), x


def benzene() -> tuple[np.ndarray, np.ndarray]:
    """D6h benzene: r(CC) 1.391, r(CH) 1.084 (gas-phase ED/microwave)."""
    rcc, rch = 1.391, 1.084
    z, x = [], []
    for k in range(6):
        ang = k * np.pi / 3
        z.append(6)
        x.append([rcc * np.cos(ang), rcc * np.sin(ang), 0.0])
        z.append(1)
        x.append([(rcc + rch) * np.cos(ang), (rcc + rch) * np.sin(ang), 0.0])
    return np.array(z), np.array(x)


def biphenyl(twist_deg: float = 44.0) -> tuple[np.ndarray, np.ndarray]:
    """Biphenyl with the experimental ~44 deg inter-ring twist (gas phase).

    The real-biaryl atropisomer fixture (VERDICT r2 item 6): the inter-ring
    C-C is a conjugated pi bond whose rotation has a planar barrier (ortho
    H-H clash) and a perpendicular barrier (pi-conjugation loss)."""
    rcc_ring, rch, rcc_link = 1.397, 1.084, 1.48

    def ring(attach_x, flip):
        # hexagon in the xy plane, attachment carbon toward the other ring
        ats, xs = [], []
        cx = attach_x + flip * rcc_ring  # ring center
        for k in range(6):
            # k = 0 is the attachment carbon, facing the other ring
            ang = np.pi + k * np.pi / 3
            c = np.array([cx + flip * rcc_ring * np.cos(ang),
                          rcc_ring * np.sin(ang), 0.0])
            ats.append(6)
            xs.append(c)
            if k != 0:  # attachment C has no H
                h = np.array([cx + flip * (rcc_ring + rch) * np.cos(ang),
                              (rcc_ring + rch) * np.sin(ang), 0.0])
                ats.append(1)
                xs.append(h)
        return ats, xs

    za, xa = ring(0.0, -1.0)
    zb, xb = ring(rcc_link, +1.0)
    xb = np.array(xb)
    # twist ring B about the inter-ring x-axis
    t = np.radians(twist_deg)
    rot = np.array([[1, 0, 0], [0, np.cos(t), -np.sin(t)], [0, np.sin(t), np.cos(t)]])
    xb = xb @ rot.T
    return np.array(za + zb), np.vstack([np.array(xa), xb])


def dimethylbiphenyl(twist_deg: float = 70.0) -> tuple[np.ndarray, np.ndarray]:
    """2,2'-dimethylbiphenyl — a REAL atropisomer fixture: the ortho methyls
    force a strongly twisted minimum and a high planar racemization barrier
    (~17-20 kcal/mol through the anti passage).

    Atom layout: biphenyl indices (ring A 0-10, ring B 11-21), with the
    ortho hydrogens at indices 2 and 13 replaced by methyl carbons; the six
    methyl hydrogens are appended at the end (indices 22-27)."""
    z, x = biphenyl(twist_deg)
    z = z.copy()
    x = x.copy()
    extra_z, extra_x = [], []
    for c_ring, h_idx in ((1, 2), (12, 13)):
        ring = range(0, 11) if c_ring < 11 else range(11, 22)
        center = x[[i for i in ring if z[i] == 6]].mean(axis=0)
        d = x[c_ring] - center
        d = d / np.linalg.norm(d)
        c_me = x[c_ring] + 1.50 * d
        z[h_idx] = 6
        x[h_idx] = c_me
        ref = np.array([0.0, 0.0, 1.0])
        if abs(d @ ref) > 0.9:
            ref = np.array([0.0, 1.0, 0.0])
        for h in _methyl(c_me, x[c_ring] - c_me, ref, r_ch=1.09, tilt=D(111.0)):
            extra_z.append(1)
            extra_x.append(h)
    return np.concatenate([z, extra_z]), np.vstack([x, extra_x])


def h2s() -> tuple[np.ndarray, np.ndarray]:
    r, th = 1.336, D(92.1)
    return np.array([16, 1, 1]), np.array(
        [[0, 0, 0], [r, 0, 0], [r * np.cos(th), r * np.sin(th), 0]]
    )


def phosphine() -> tuple[np.ndarray, np.ndarray]:
    r, hph = 1.420, D(93.5)
    cos_b2 = (1.0 + 2.0 * np.cos(hph)) / 3.0
    beta = np.arccos(np.sqrt(max(cos_b2, 0.0)))
    hs = [
        [
            r * np.sin(beta) * np.cos(D(120 * k)),
            r * np.sin(beta) * np.sin(D(120 * k)),
            r * np.cos(beta),
        ]
        for k in range(3)
    ]
    return np.array([15, 1, 1, 1]), np.array([[0, 0, 0]] + hs)


def methanethiol() -> tuple[np.ndarray, np.ndarray]:
    # C-S 1.819, S-H 1.340, CSH 96.5 (microwave, Kojima 1960)
    c = np.array([0.0, 0.0, 0.0])
    s = np.array([1.819, 0.0, 0.0])
    th = D(96.5)
    h_s = s + 1.34 * np.array([np.cos(np.pi - th), np.sin(np.pi - th), 0.0])
    hs_c = _methyl(c, np.array([1.0, 0.0, 0.0]), np.array([0.0, 1.0, 0.0]))
    return np.array([6, 16] + [1] * 4), np.vstack([c, s, *hs_c, h_s])


def dimethyl_sulfide() -> tuple[np.ndarray, np.ndarray]:
    # C-S 1.807, CSC 98.9 (microwave)
    th = D(98.9)
    s = np.array([0.0, 0.0, 0.0])
    c1 = 1.807 * np.array([np.cos(th / 2), np.sin(th / 2), 0.0])
    c2 = 1.807 * np.array([np.cos(th / 2), -np.sin(th / 2), 0.0])
    hs1 = _methyl(c1, -c1 / np.linalg.norm(c1), np.array([0.0, 0.0, 1.0]))
    hs2 = _methyl(c2, -c2 / np.linalg.norm(c2), np.array([0.0, 0.0, 1.0]))
    return np.array([16, 6, 6] + [1] * 6), np.vstack([s, c1, c2, *hs1, *hs2])


def acetylene() -> tuple[np.ndarray, np.ndarray]:
    """Linear HCCH (microwave r0): C#C 1.203, C-H 1.061 — the sp-carbon
    anchor (s-character contracts sigma bonds to sp centers)."""
    rcc, rch = 1.203, 1.061
    return np.array([6, 6, 1, 1]), np.array(
        [[0, 0, 0], [rcc, 0, 0], [-rch, 0, 0], [rcc + rch, 0, 0]]
    )


def hydrogen_cyanide() -> tuple[np.ndarray, np.ndarray]:
    """Linear HCN (microwave r_e): C#N 1.153, C-H 1.065."""
    rcn, rch = 1.153, 1.065
    return np.array([6, 7, 1]), np.array(
        [[0, 0, 0], [rcn, 0, 0], [-rch, 0, 0]]
    )


def propyne() -> tuple[np.ndarray, np.ndarray]:
    """H3C-C#C-H (microwave): the sp3-sp SINGLE bond at 1.459 A — 0.077 A
    below the sp3-sp3 value; the s-character contraction anchor for C-C."""
    r_single, r_triple, r_ch_sp = 1.459, 1.206, 1.061
    c_me = np.zeros(3)
    c1 = np.array([r_single, 0, 0])
    c2 = c1 + np.array([r_triple, 0, 0])
    h_sp = c2 + np.array([r_ch_sp, 0, 0])
    hs = _methyl(c_me, np.array([1.0, 0, 0]), np.array([0, 1.0, 0]), r_ch=1.088)
    return np.array([6, 6, 6, 1, 1, 1, 1]), np.vstack([c_me, c1, c2, h_sp, *hs])


def acetonitrile() -> tuple[np.ndarray, np.ndarray]:
    """H3C-C#N (microwave): sp3-sp C-C 1.458, C#N 1.157."""
    r_single, r_cn = 1.458, 1.157
    c_me = np.zeros(3)
    c1 = np.array([r_single, 0, 0])
    n = c1 + np.array([r_cn, 0, 0])
    hs = _methyl(c_me, np.array([1.0, 0, 0]), np.array([0, 1.0, 0]), r_ch=1.092)
    return np.array([6, 6, 7, 1, 1, 1]), np.vstack([c_me, c1, n, *hs])


def cyclohexane(conf: str = "chair") -> tuple[np.ndarray, np.ndarray]:
    """C6H12 ring (electron diffraction r_g: C-C 1.536, CCC 111.4).

    conf="chair" puckers the ring with the alternating-sign (m=3) mode;
    conf="twist_boat" uses the m=2 Cremer-Pople mode at phi=30 deg (the D2
    twist-boat, a genuine local minimum ~5.9 kcal/mol above the chair) —
    both are descent basins, so plain FIRE relax stays in the started
    conformer. Hydrogens sit on the tetrahedral complement of the two ring
    bonds (axial/equatorial emerge from the pucker)."""
    if conf == "chair":
        a = 0.25
        r = float(np.sqrt(1.536**2 - 4 * a * a))
        zs = a * (-1.0) ** np.arange(6)
    elif conf == "twist_boat":
        r, b = 1.49, 0.44
        zs = b * np.cos(np.pi / 6 + 2 * np.pi * np.arange(6) * 2 / 6)
    else:  # pragma: no cover
        raise ValueError(conf)
    ang = np.arange(6) * np.pi / 3
    C = np.stack([r * np.cos(ang), r * np.sin(ang), zs], axis=1)
    half = np.radians(53.6)  # half the HCH angle
    hs = []
    for k in range(6):
        b1 = C[(k - 1) % 6] - C[k]
        b1 /= np.linalg.norm(b1)
        b2 = C[(k + 1) % 6] - C[k]
        b2 /= np.linalg.norm(b2)
        u = -(b1 + b2)
        u /= np.linalg.norm(u)
        v = np.cross(b1, b2)
        v /= np.linalg.norm(v)
        for s in (+1.0, -1.0):
            hs.append(C[k] + 1.093 * (u * np.cos(half) + s * v * np.sin(half)))
    return np.array([6] * 6 + [1] * 12), np.vstack([C, *hs])


def _c2v_ring(het_z, r_het_c, r_cc, ang_het, ang_c2, n_ring, r_ch, extra_cc=None):
    """Planar C2v heteroaromatic ring: heteroatom at the top (index 0),
    ring walked symmetrically down both sides from experimental bond
    lengths/angles; exocyclic H on every carbon along the exterior
    bisector. Returns (atomnos, coords) with ring atoms first (0..n-1,
    ordered het, C2, C3, [C4,] C3', C2')."""
    half = np.radians(ang_het / 2.0)
    het = np.zeros(2)
    c2 = het + r_het_c * np.array([np.sin(half), -np.cos(half)])
    # interior direction at C2: rotate the C2->het direction by the ring
    # angle at C2 (toward the mirror axis, i.e. negative rotation)
    def rot(v, a):
        c, s = np.cos(a), np.sin(a)
        return np.array([c * v[0] - s * v[1], s * v[0] + c * v[1]])

    d_to_het = (het - c2) / np.linalg.norm(het - c2)
    c3 = c2 + r_cc * rot(d_to_het, np.radians(ang_c2))
    ring = [het, c2, c3]
    if n_ring == 6:
        # C4 sits on the mirror axis, bonded to C3 at extra_cc
        y4 = c3[1] - np.sqrt(max(extra_cc**2 - c3[0] ** 2, 1e-9))
        ring.append(np.array([0.0, y4]))
    ring += [np.array([-p[0], p[1]]) for p in ring[1:3][::-1]]
    ring = np.array(ring)
    zs = [het_z] + [6] * (len(ring) - 1)
    xs = [np.array([p[0], p[1], 0.0]) for p in ring]
    m = len(ring)
    for k in range(1, m):
        b1 = ring[(k - 1) % m] - ring[k]
        b2 = ring[(k + 1) % m] - ring[k]
        u = -(b1 / np.linalg.norm(b1) + b2 / np.linalg.norm(b2))
        u /= np.linalg.norm(u)
        xs.append(np.array([*(ring[k] + r_ch * u), 0.0]))
        zs.append(1)
    return np.array(zs), np.vstack(xs)


def pyridine() -> tuple[np.ndarray, np.ndarray]:
    """Pyridine at the experimental geometry (microwave r0): C-N 1.338,
    C2-C3 1.394, C3-C4 1.392, CNC 116.9, NC2C3 123.8 — the aromatic-N
    anchor (geometric pi orders must reproduce the short aromatic C-N)."""
    return _c2v_ring(7, 1.338, 1.394, 116.9, 123.8, 6, 1.082, extra_cc=1.392)


def furan() -> tuple[np.ndarray, np.ndarray]:
    """Furan at the experimental geometry (microwave rs): C-O 1.362,
    C2=C3 1.361, C3-C4 1.431, COC 106.5, OC2C3 110.7 — the conjugated-O
    anchor: the divalent O bridging two sp2 carbons is perceived SP2 so
    its bonds carry pi density (and the C2=C3 / C3-C4 alternation must
    survive relaxation)."""
    return _c2v_ring(8, 1.362, 1.361, 106.5, 110.7, 5, 1.076)


def thiophene() -> tuple[np.ndarray, np.ndarray]:
    """Thiophene at the experimental geometry (microwave rs): S-C 1.714,
    C2=C3 1.370, C3-C4 1.423, CSC 92.2, SC2C3 111.5."""
    return _c2v_ring(16, 1.714, 1.370, 92.2, 111.5, 5, 1.078)


def methyl_halide(z_x: int) -> tuple[np.ndarray, np.ndarray]:
    """CH3X at the experimental C-X length (CCCBDB microwave r0):
    CH3F 1.383, CH3Cl 1.785, CH3Br 1.933, CH3I 2.132."""
    r_cx = {9: 1.383, 17: 1.785, 35: 1.933, 53: 2.132}[z_x]
    c = np.zeros(3)
    x = np.array([r_cx, 0.0, 0.0])
    hs = _methyl(c, np.array([1.0, 0.0, 0.0]), np.array([0.0, 1.0, 0.0]))
    return np.array([6, z_x, 1, 1, 1]), np.vstack([c, x, *hs])


def hydrogen_halide(z_x: int) -> tuple[np.ndarray, np.ndarray]:
    """HX diatomics at the experimental r_e: HF 0.917, HCl 1.275,
    HBr 1.414, HI 1.609."""
    r = {9: 0.917, 17: 1.275, 35: 1.414, 53: 1.609}[z_x]
    return np.array([z_x, 1]), np.array([[0.0, 0.0, 0.0], [r, 0.0, 0.0]])


# --------------------------------------------------------------------------
# literature targets: name -> (value, tolerance)
# --------------------------------------------------------------------------

# experimental hydration free energies (kcal/mol, 298 K; Ben-Naim/FreeSolv
# conventions) used to anchor the native GB+SASA model (fit_solvation.py)
HYDRATION_TARGETS: dict[str, tuple[float, float]] = {
    # name -> (dG_hyd, tolerance)
    "water": (-6.32, 1.5),
    "methanol": (-5.11, 1.5),
    "ammonia": (-4.29, 1.5),
    "methane": (2.00, 0.9),
    "ethane": (1.83, 0.9),
    "butane": (2.08, 1.0),
    "formaldehyde": (-2.75, 1.2),
    "formic_acid": (-6.70, 2.5),
}

# Aqueous solvation free energies of IONS (kcal/mol): Kelly, Cramer &
# Truhlar, J. Phys. Chem. B 2006 (cluster-pair approximation, consistent
# with dG*_aq(H+) = -265.9). These calibrate the charge-dependent Born
# corrections (solvation.py k_qr electrostriction + hct_ion descreening,
# fit_solvation.run_ion_fit) that the GB+SASA model needs beyond the
# neutral-anchored fit — ion solvation is ~10x the neutral scale and its
# homolog deltas (formate vs acetate) set the aqueous pKa deltas.
ION_HYDRATION_TARGETS: dict[str, tuple[float, float]] = {
    "hydroxide": (-104.7, 5.0),
    "methoxide": (-95.2, 5.0),
    "formate": (-76.2, 4.0),
    "acetate": (-77.3, 4.0),
    "ammonium": (-85.2, 4.0),
    "methylammonium": (-76.4, 4.0),
}


TARGETS: dict[str, tuple[float, float]] = {
    # torsion energetics (kcal/mol)
    "ethane_barrier": (2.9, 1.0),
    "butane_gauche": (0.75, 0.35),
    # rigid-scan proxy: the relaxed syn barrier is ~5.5, a rigid rotation
    # from the anti geometry keeps the full H...H clash (~+2-3 on top)
    "butane_syn_barrier": (7.0, 3.0),
    "ethylene_twist": (65.0, 8.0),
    # H-bond energetics (kcal/mol)
    "water_dimer_de": (5.0, 1.8),
    "formic_dimer_de": (18.6, 7.0),
    # equilibrium geometry (A / degrees)
    "water_oh": (0.958, 0.025),
    "water_hoh": (104.5, 5.0),
    "ethane_cc": (1.536, 0.035),
    "ethane_ch": (1.091, 0.035),
    "ethylene_cc": (1.339, 0.04),
    "formaldehyde_co": (1.205, 0.05),
    "methanol_co": (1.427, 0.05),
    "ammonia_nh": (1.012, 0.03),
    "water_dimer_oo": (2.91, 0.25),
    # biphenyl equilibrium inter-ring twist (gas-phase ED: 44.4 deg) — the
    # conjugation / ortho-H-sterics / dispersion balance; a near-planar or
    # near-perpendicular minimum means one term has swamped the others
    "biphenyl_twist": (44.0, 22.0),
    # aromatic ring geometry (benzene ED/microwave)
    "benzene_cc": (1.391, 0.03),
    # substitution-dependent rotor barriers: methanol's 3 eclipsing pairs
    # vs ethane's 9 (per-quad torsion weighting; microwave barrier 1.07)
    "methanol_oh_torsion": (1.07, 0.5),
    # NH3 inversion (planar - pyramidal, rigid planarized proxy; exp 5.8)
    "nh3_inversion": (5.8, 2.5),
    # amide C-N rotation, rigid 90-degree proxy (exp relaxed 16-18; the
    # rigid path keeps N planar so the proxy sits a few kcal above)
    "formamide_rotation": (20.0, 8.0),
    # second-row hydride/thioether geometry (microwave): near-pure-p
    # bonding at S/P — X-H radius offset + divalent-S/trivalent-P angles
    "h2s_sh": (1.336, 0.03),
    "h2s_hsh": (92.1, 5.0),
    "ch3sh_cs": (1.819, 0.04),
    "dms_csc": (98.9, 5.0),
    "ph3_ph": (1.420, 0.03),
    "ph3_hph": (93.5, 4.0),
    # halogens (F/Cl/Br/I): C-X from the methyl halides, H-X from the
    # hydrogen halides (microwave, CCCBDB) — radius + X-H offset solved
    # jointly, growing pure-p correction down the group
    "ch3f_cf": (1.383, 0.04),
    "ch3cl_ccl": (1.785, 0.04),
    "ch3br_cbr": (1.933, 0.04),
    "ch3i_ci": (2.132, 0.04),
    "hf_hf": (0.917, 0.03),
    "hcl_hcl": (1.275, 0.03),
    "hbr_hbr": (1.414, 0.03),
    "hi_hi": (1.609, 0.03),
    # sp carbon (alkynes/nitriles, microwave): the triple bond via the pi
    # contraction, the NEIGHBORING sigma bonds via the (1-BO)-gated
    # s-character term kr_sp — alkyne C-H is 0.03 A below sp3 C-H and the
    # propyne sp3-sp single bond 0.077 A below the sp3-sp3 value
    "acetylene_cc": (1.203, 0.04),
    "acetylene_ch": (1.061, 0.035),
    "hcn_cn": (1.153, 0.035),
    "propyne_cc_single": (1.459, 0.045),
    "acetonitrile_cc": (1.458, 0.045),
    # saturated ring (cyclohexane): chair geometry (electron diffraction
    # r_g) and the chair -> twist-boat electronic energy gap (high-level
    # ab initio ~5.9 kcal/mol; exp dH ~5.5) — tests that ring closure
    # keeps bond/angle anchors AND that the torsion model produces the
    # right conformer ordering with a real twist-boat local minimum
    "cyclohexane_cc": (1.536, 0.03),
    "cyclohexane_ccc": (111.4, 2.0),
    "cyclohexane_twist_boat": (5.9, 2.0),
    # chair -> chair ring-flip barrier through the half-chair TS (NMR
    # line-shape dH-ddagger 10.8 kcal/mol; DFT electronic barriers
    # 11-12): the full TS stack end-to-end — CI-NEB chair->twist-boat,
    # EF saddle refinement on exact autodiff Hessians, exactly one
    # imaginary mode (DFT half-chair ~ -230 cm-1)
    "cyclohexane_ringflip_barrier": (10.8, 3.0),
    # heteroaromatics (microwave): aromatic C-N via geometric pi orders
    # with the divalent-sp2-N angle reference; conjugated divalent O/S
    # (SP2 second pass) carries pi density on the het-C bonds, and the
    # furan/thiophene C2=C3 / C3-C4 alternation must survive relaxation
    # harmonic vibrational frequencies (cm-1, vs experimental HARMONIC
    # values where available): the Morse stretch table is calibrated
    # against literature force constants (calibrate_stretch.py), so
    # stretch modes are quantitative; mode identification is by sorted
    # position (min = softest, max = stiffest) to stay index-robust
    "freq_water_bend": (1649.0, 200.0),
    "freq_water_stretch": (3943.0, 395.0),
    "freq_methane_ch": (3157.0, 250.0),
    "freq_ethane_torsion": (307.0, 75.0),
    "freq_ethylene_ch": (3258.0, 260.0),
    "freq_hcn_cn": (2129.0, 170.0),
    "freq_hcn_ch": (3442.0, 275.0),
    # harmonic ZPE of water (sum of the exp harmonic modes / 2 ->
    # 13.47 kcal/mol) through the thermo stack's zero_point_energy
    "zpe_water": (13.47, 1.0),
    # standard molar entropies (NIST-JANAF ideal gas, 1 atm, 298.15 K,
    # cal/mol/K) through the full thermo stack: GFN-FF relaxed minimum ->
    # exact autodiff Hessian -> qRRHO S_vib + S_trans + S_rot(sigma).
    # Trans/rot parts are exact given mass + the anchored geometry; the
    # vibrational part tests the calibrated low modes (ethane's hindered
    # torsion carries ~1.5 cal/mol/K and is treated harmonically, hence
    # the wider tolerance there)
    "s298_water": (45.10, 0.9),
    "s298_ammonia": (46.04, 0.9),
    "s298_methane": (44.52, 0.9),
    "s298_ethane": (54.85, 1.5),
    "pyridine_cn": (1.338, 0.035),
    "pyridine_cnc": (116.9, 2.5),
    "furan_co": (1.362, 0.035),
    "furan_c2c3": (1.361, 0.035),
    "furan_c3c4": (1.431, 0.035),
    "thiophene_sc": (1.714, 0.035),
    "thiophene_csc": (92.2, 3.0),
    # gas-phase relative acidity (kcal/mol): Delta-E_deprot(methanol) -
    # Delta-E_deprot(formic acid), exp Delta-DeltaH_acid = 381.7 - 345.3
    # (NIST), evaluated with the site-constrained EEQ (params.K_CT).
    "ddep_methanol_minus_formic": (36.4, 12.0),
    # gas-phase ion CLASS deltas (kcal/mol), promoted from round-3
    # diagnostics to pass/fail anchors by the site-constrained EEQ fix
    # (GFNFFTopology.site_b + fitted params.K_CT): free atom-space EEQ
    # missed these by 12-50 kcal/mol (molecular capacitance ~ atom count);
    # the constrained model lands every one within ~3. exp values: NIST
    # gas-phase DeltaH_acid / proton-affinity differences.
    # ester / secondary amine geometry (round-4 fixture extension): the
    # C=O and amine rows are clean anchors; the two ester single bonds
    # (acyl C-O 1.334 vs alkyl O-C 1.437) average out in the FF (no
    # conjugation asymmetry), so their MEAN is anchored and the split is a
    # documented limitation.
    # charged hydrogen bonds (CAHB): binding energies of the fitted
    # anchors themselves (2 params on 2 anchors — the regression value is
    # that they STAY reproduced; both complexes were unbound pre-fit)
    "chb_nh4_water_de": (20.6, 4.0),
    "chb_hydroxide_water_de": (26.7, 4.0),
    "ester_co_double": (1.200, 0.035),
    "ester_co_single_mean": (1.386, 0.035),
    "dma_cn": (1.462, 0.035),
    "dma_cnc": (112.2, 3.0),
    "ddep_water_minus_methanol": (8.6, 4.0),      # 390.3 - 381.7
    "ddep_methanol_minus_ethanol": (3.4, 4.0),    # 381.7 - 378.3
    "ddep_acetic_minus_formic": (2.8, 4.0),       # 348.1 - 345.3
    "dpa_methylamine_minus_ammonia": (10.9, 5.0),  # 214.9 - 204.0
}

# exp values of the ion class deltas alone (the K_CT fit target set,
# scripts/fit_kct.py; same numbers as the TARGETS rows above)
ION_DIAGNOSTICS: dict[str, float] = {
    "ddep_water_minus_methanol": 8.6,
    "ddep_methanol_minus_ethanol": 3.4,
    "ddep_acetic_minus_formic": 2.8,
    "dpa_methylamine_minus_ammonia": 10.9,
}


# Regression caps on the force RMS at the experimental geometries
# (kcal/mol/A): the worst rows are visibly shifted minima (sp-carbon
# contraction, H-bond wells — VERDICT r3 weak #4); the caps pin them at
# ~1.15x their round-4 values so any regression fails tests/test_accuracy.
# Everything not listed must stay under the generic cap.
FORCE_RMS_CAPS: dict[str, float] = {
    # sp-carbon rows ratcheted from 74/51/41 after the r5 radius work
    # (kr_sp_h split + kr_triple/kt_en): relaxed sp geometries now match
    # experiment to ~0.005 A and residuals are single-digit
    "acetylene": 3.0,
    "water_dimer": 52.0,
    "propyne": 8.0,
    "formic_dimer": 43.0,
    "formic_acid": 42.0,
    "hcn": 4.0,
    "acetonitrile": 9.0,
    "formamide": 20.0,
    "formaldehyde": 18.0,
    "ethylene": 17.0,
}
FORCE_RMS_GENERIC_CAP = 16.0
