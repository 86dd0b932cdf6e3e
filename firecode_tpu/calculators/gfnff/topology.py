"""GFN-FF host-side topology perception -> padded device tables.

Mirrors the setup stage of the published GFN-FF (Spicher & Grimme 2020): a
force field is *generated* for each system from its element composition,
bond graph, and one input geometry — hybridization states, pi bond orders,
equilibrium lengths/angles, torsion potentials, out-of-plane terms,
repulsion/dispersion pair tables, EEQ charge-model parameters, and
hydrogen-/halogen-bond donor-acceptor triplets.

The topology holds only STRUCTURAL quantities (bond orders, radii sums, EN
differences, path counts, element factors); everything that depends on the
global scalars in params.GlobalParams is computed inside
firecode_tpu.calculators.gfnff.energy at evaluation time. That keeps the
total energy differentiable in the global parameters, which is what the
in-repo fit (fit.py) trains against the embedded literature fixtures.

Reference capability: the xtb binary's GFN-FF topology setup invoked by
/root/reference/firecode/calculators/xtb.py:39-283 (CALC=GFNFF there).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from firecode_tpu.calculators.gfnff.params import (
    AU_C6_TO_KCAL_A6,
    BOND_F,
    STRETCH_F,
    C6_FREE,
    CHI,
    EEQ_ALPHA,
    EEQ_CNF,
    EN_PAULING,
    ETA,
    REP_ALPHA,
    REP_ZEFF,
    VDW_RADII,
)
from firecode_tpu.graphs import graphize
from firecode_tpu.pt import COVALENT_RADII

SP3, SP2, SP = 0, 1, 2

# elements acting as HB donors (carrying the H) and acceptors
_HB_DONOR_Z = (7, 8)  # N, O
_HB_ACCEPTOR_Z = (7, 8, 9)  # N, O, F
_XB_Z = (17, 35, 53)  # Cl, Br, I
_XB_ACCEPTOR_Z = (7, 8)

# acceptor/donor element strength factors for the HB correction
_HB_ACC_F = {7: 0.9, 8: 1.0, 9: 0.55}
_HB_DON_F = {7: 0.80, 8: 1.0}
_XB_F = {17: 0.55, 35: 1.0, 53: 1.45}

# ATM three-body dispersion neighbor cap (A): triplets with any setup-
# geometry pair beyond this are dropped — their r^-9 envelope contributes
# < 1e-4 kcal/mol each. Eh*a0^9 -> kcal/mol*A^9 for the C9 coefficients.
_ATM_CUTOFF = 6.0
AU_C9_TO_KCAL_A9 = 627.509474 * 0.529177210903**9


class GFNFFTopology(NamedTuple):
    atomnos: jnp.ndarray  # i32[N]
    charge: float
    # EEQ (runtime charges)
    chi: jnp.ndarray  # f[N] eV (CN-corrected at runtime)
    eta: jnp.ndarray  # f[N] eV
    eeq_alpha: jnp.ndarray  # f[N] A
    cnf: jnp.ndarray  # f[N] eV
    rcov: jnp.ndarray  # f[N] A (for the runtime CN)
    # bonds (Morse; r0/depth/width derived from these in the energy)
    bonds: jnp.ndarray  # i32[B, 2]
    bonds_z: jnp.ndarray  # i32[B, 2] element numbers (bond-radius lookup)
    bond_rs: jnp.ndarray  # f[B] covalent radii sum (diagnostic)
    bond_den: jnp.ndarray  # f[B] |EN_i - EN_j|
    bond_bo: jnp.ndarray  # f[B] pi bond order [0, 1.5]
    bond_f: jnp.ndarray  # f[B] sqrt(f_i * f_j) element strength
    bond_sf: jnp.ndarray  # f[B] sqrt(sf_i * sf_j) Morse stretch factor
    #   (STRETCH_F: force-constant-calibrated, separate from bond_f so
    #   stretch curvature and angle stiffness are decoupled)
    bond_nsp: jnp.ndarray  # f[B] count of sp-hybridized atoms in the bond
    #   (0/1/2): sigma bonds to sp centers contract with s-character
    #   (alkyne C-H 1.061 vs sp3 1.091, propyne C-C 1.459 vs 1.536); the
    #   contraction is gated by (1 - BO_pi) in the energy so multiple bonds
    #   (already contracted via kr_pi) are not double-counted
    # angles
    angles: jnp.ndarray  # i32[A, 3] i-center-j
    angle_cos0: jnp.ndarray  # f[A]
    angle_lin: jnp.ndarray  # f[A] 1.0 for linear centers
    angle_f: jnp.ndarray  # f[A] element strength factor
    angle_bond: jnp.ndarray  # i32[A, 2] indices into bonds for damping
    # torsions
    torsions: jnp.ndarray  # i32[T, 4]
    tors_n: jnp.ndarray  # f[T] periodicity (3 sp3-like / 2 pi-like)
    tors_bo: jnp.ndarray  # f[T] central-bond pi order
    tors_paths: jnp.ndarray  # f[T] per-quad weight vs the fully-substituted
    #   reference rotor (1/9 sp3, 1/4 pi) — barriers grow with substitution
    tors_bond: jnp.ndarray  # i32[T, 3] bond indices (ij, jk, kl) for damping
    # out-of-plane (sp2 planarity)
    oop: jnp.ndarray  # i32[O, 4] center + 3 neighbors
    oop_f: jnp.ndarray  # f[O] per-term weight (1 real, 0 padded lanes)
    # pairwise tables
    mask_13: jnp.ndarray  # f[N, N] 1 for 1-3 pairs
    mask_nb: jnp.ndarray  # f[N, N] 1 for >=1-4 / nonbonded pairs
    mask_hb_pair: jnp.ndarray  # f[N, N] 1 on H...acceptor / donor...acceptor
    #   pairs (their Pauli wall is softened by krep_hb: charge transfer
    #   compresses HB contacts far below the nonpolar vdW wall)
    rep_z: jnp.ndarray  # f[N, N] ZA*ZB
    rep_a: jnp.ndarray  # f[N, N] sqrt(aA*aB)
    c6: jnp.ndarray  # f[N, N] pair C6 (kcal/mol A^6)
    rvdw_sum: jnp.ndarray  # f[N, N] vdW radii sums (BJ radius input)
    disp_mask: jnp.ndarray  # f[N, N] 1 off-diagonal
    # HB / XB triplets
    hb: jnp.ndarray  # i32[H, 3] donor, H, acceptor
    hb_f: jnp.ndarray  # f[H] element/charge strength factor
    hb_sp2: jnp.ndarray  # f[H] 1.0 for sp2-O acceptors (khb_sp2 boost:
    #   resonance-assisted carbonyl/carboxyl HBs bind far harder than
    #   their element factor alone — acid dimers, amide bridges)
    # charge-assisted H-bond features (NONZERO ONLY on ion topologies,
    # |charge| > 0.5, so neutral chemistry is bit-identical): cationic
    # donor groups (NH4+) and anionic acceptors (HO-) bind 3-5x harder
    # than their neutral analogs — the EEQ partial-charge scale is too
    # small to carry that through the ES term alone (measured: the
    # NH4+...OH2 complex came out UNBOUND by 4 kcal/mol vs CCSD(T) +20.6)
    hb_qd: jnp.ndarray  # f[H] clip(q_topo[d]+q_topo[h], 0, 2) * is_ion
    hb_qa: jnp.ndarray  # f[H] clip(-q_topo[a], 0, 2) * is_ion
    xb: jnp.ndarray  # i32[X, 3] C, X, acceptor
    xb_f: jnp.ndarray  # f[X]
    q_topo: jnp.ndarray  # f[N] setup-geometry EEQ charges (diagnostic/HB)
    # site-constrained charge transfer (ion energetics): a soft penalty
    # (site_k/2) * (sum(site_b * q) - site_c)^2 added to the EEQ objective.
    # Plain atom-space EEQ lets a net ion charge spread over the whole
    # molecule, so the molecular "capacitance" grows with atom count and
    # larger ions are overstabilized (the round-3 ddep errors of up to
    # ~50 kcal/mol). Restricting inter-group charge transfer between the
    # reacting functional group (site_b = 1 there) and the remainder kills
    # the size artifact while both regions still polarize internally; the
    # penalty is a rank-1 SPD update of the EEQ matrix, so the solve stays
    # CG + variational (exact Hellmann-Feynman forces). site_k = 0 (the
    # default, every neutral workflow) is EXACTLY the unconstrained model.
    site_b: jnp.ndarray  # f[N] membership of the constrained group
    site_c: float  # target net charge of the group
    site_k: float  # penalty stiffness (kcal/mol/e^2); 0 = off
    # ATM three-body dispersion triplets (Axilrod-Teller-Muto, the term of
    # published GFN-FF previously omitted). Neighbor-capped at setup: only
    # triplets whose three pairs are all nonbonded-eligible (mask_nb) AND
    # within _ATM_CUTOFF of each other at the setup geometry — beyond that
    # the r^-9 envelope is < 1e-4 kcal/mol per triplet. c9 = 0 on padded
    # slots makes them inert.
    atm: jnp.ndarray  # i32[T3, 3] i < j < k
    atm_c9: jnp.ndarray  # f[T3] C9 coefficient (kcal/mol A^9)
    atm_rvdw: jnp.ndarray  # f[T3, 3] vdW radius sums of pairs (ij, jk, ik)


def _hybridization(graph, atomnos, coords) -> np.ndarray:
    """Per-atom hybridization (SP3/SP2/SP) from degree + local geometry."""
    n = len(atomnos)
    hyb = np.full(n, SP3, dtype=np.int32)

    def mean_angle(c):
        nbrs = sorted(graph.neighbors(c))
        if len(nbrs) < 2:
            return 109.47
        angs = []
        for a in range(len(nbrs)):
            for b in range(a + 1, len(nbrs)):
                v1 = coords[nbrs[a]] - coords[c]
                v2 = coords[nbrs[b]] - coords[c]
                cos = np.dot(v1, v2) / (np.linalg.norm(v1) * np.linalg.norm(v2) + 1e-12)
                angs.append(np.degrees(np.arccos(np.clip(cos, -1, 1))))
        return float(np.mean(angs))

    for i in range(n):
        z = int(atomnos[i])
        deg = graph.degree[i]
        if z == 6:
            if deg >= 4:
                hyb[i] = SP3
            elif deg == 3:
                hyb[i] = SP2
            elif deg == 2:
                hyb[i] = SP if mean_angle(i) > 155.0 else SP2
            else:
                hyb[i] = SP
        elif z == 7:
            if deg >= 4:
                hyb[i] = SP3
            elif deg == 3:
                # planar (amide/aniline/aromatic) vs pyramidal amine
                hyb[i] = SP2 if 3 * mean_angle(i) > 352.0 else SP3
            elif deg == 2:
                hyb[i] = SP if mean_angle(i) > 155.0 else SP2
            else:
                hyb[i] = SP  # nitrile
        elif z in (8, 16):
            if deg >= 2:
                hyb[i] = SP3
            elif deg == 1:
                j = next(iter(graph.neighbors(i)))
                r = float(np.linalg.norm(coords[i] - coords[j]))
                rs = float(COVALENT_RADII[z] + COVALENT_RADII[atomnos[j]])
                hyb[i] = SP2 if r < 0.93 * rs else SP3  # carbonyl-like
            else:
                hyb[i] = SP3
        elif z in (5, 13):
            hyb[i] = SP2 if deg <= 3 else SP3
        else:
            hyb[i] = SP3
    # second pass: a divalent O/S bridging two sp2/sp HEAVY centers is
    # conjugated (furan, thiophene, diaryl ethers) — mark it SP2 so its
    # bonds can carry geometric pi density. Deliberately narrow: an O-H
    # or a single sp3 neighbor keeps the ether/alcohol O at SP3, so
    # alcohols, ethers and carboxylic O-H are untouched.
    for i in range(n):
        if int(atomnos[i]) in (8, 16) and graph.degree[i] == 2:
            nbrs = sorted(graph.neighbors(i))
            if all(
                int(atomnos[j]) > 1 and hyb[j] in (SP2, SP) for j in nbrs
            ):
                hyb[i] = SP2
    return hyb


def _pi_bond_order(i, j, atomnos, coords, hyb) -> float:
    """Smooth geometric pi bond order in [0, 1.5] from bond contraction.

    Only non-sp3 pairs can carry pi density; a bond at the single-bond
    radii sum has BO_pi 0, at 14% contraction 1 (double), clipped at 1.6
    (experimental triples sit at ~1.55 on this scale — acetylene 1.203 A —
    so a 1.5 cap would bias every triple bond ~0.03 A long; the cap only
    guards against pathologically compressed input contacts). Perceived
    once from the setup geometry."""
    if hyb[i] == SP3 or hyb[j] == SP3:
        return 0.0
    rs = float(COVALENT_RADII[atomnos[i]] + COVALENT_RADII[atomnos[j]])
    rd = 0.86 * rs
    r = float(np.linalg.norm(coords[i] - coords[j]))
    return float(np.clip((rs - r) / (rs - rd), 0.0, 1.6))


def _angle_cos0(z: int, hyb_c: int, deg: int = 0) -> tuple[float, float]:
    """(cos theta0, is_linear) for an angle centered on element z with
    graph degree `deg`."""
    if hyb_c == SP:
        return -1.0, 1.0
    # divalent O/S keep their element angle even when conjugation marks
    # them SP2 (furan COC 106.5, thiophene CSC 92.2): the lone pairs, not
    # the pi system, set the angle — and carbonyl O (SP2, degree 1) never
    # centers an angle, so this ordering costs nothing
    if z == 8:
        return float(np.cos(np.radians(104.5))), 0.0
    if z == 16:
        # divalent S bonds through nearly pure p orbitals: H2S 92.1, DMS
        # 98.9 (sterics open it) — 94.5 splits the error across both
        return float(np.cos(np.radians(94.5))), 0.0
    if z == 7 and hyb_c == SP2 and deg == 2:
        # divalent sp2 N (pyridine-type / imine): the in-plane lone pair
        # closes the angle below 120 — methanimine HNC 110.4, pyridine CNC
        # 116.9 (there, ring closure against the stiff neighboring CCC/CCN
        # angles opens the relaxed value well above this reference)
        return float(np.cos(np.radians(110.0))), 0.0
    if hyb_c == SP2:
        return float(np.cos(np.radians(120.0))), 0.0
    if z == 7:
        return float(np.cos(np.radians(107.0))), 0.0
    if z == 15:
        return float(np.cos(np.radians(93.5))), 0.0  # PH3 exp 93.5
    return float(np.cos(np.radians(109.47))), 0.0


def build_gfnff_topology(
    atomnos: np.ndarray,
    coords: np.ndarray,
    graph=None,
    charge: int = 0,
    charge_site=None,
    site_charge_target: float | None = None,
    site_k: float | None = None,
) -> GFNFFTopology:
    """Generate the (structural) force-field topology for one system.

    charge_site: optional atom indices (or bool mask) of the functional
    group holding the net-charge constraint (ion workflows; see the
    GFNFFTopology.site_b docs). site_charge_target: the group's target net
    charge (e.g. neutral-parent group charge - 1 for a deprotonation).
    site_k: penalty stiffness; defaults to params.K_CT (fitted against the
    ion fixtures) when a site is given."""
    atomnos = np.asarray(atomnos)
    coords = np.asarray(coords, dtype=np.float64)
    n = len(atomnos)
    if graph is None:
        graph = graphize(atomnos, coords)

    site_b = np.zeros(n)
    site_c = 0.0
    k_ct = 0.0
    if charge_site is not None:
        from firecode_tpu.calculators.gfnff.params import K_CT

        charge_site = np.asarray(charge_site)
        if charge_site.dtype == bool:
            site_b[charge_site] = 1.0
        else:
            site_b[charge_site.astype(int)] = 1.0
        if site_charge_target is None:
            raise ValueError("charge_site requires site_charge_target")
        site_c = float(site_charge_target)
        k_ct = float(site_k) if site_k is not None else K_CT

    hyb = _hybridization(graph, atomnos, coords)
    en = EN_PAULING[atomnos]

    # ---------------- bonds ----------------
    bonds = sorted(tuple(sorted(e)) for e in graph.edges)
    bond_index = {b: k for k, b in enumerate(bonds)}
    bo_pi = {b: _pi_bond_order(b[0], b[1], atomnos, coords, hyb) for b in bonds}
    bond_rs = [float(COVALENT_RADII[atomnos[i]] + COVALENT_RADII[atomnos[j]]) for i, j in bonds]
    bond_den = [abs(float(en[i] - en[j])) for i, j in bonds]
    bond_bo = [bo_pi[b] for b in bonds]
    bond_f = [
        float(np.sqrt(BOND_F[atomnos[i]] * BOND_F[atomnos[j]])) for i, j in bonds
    ]
    bond_sf = [
        float(np.sqrt(STRETCH_F[atomnos[i]] * STRETCH_F[atomnos[j]]))
        for i, j in bonds
    ]
    bond_nsp = [
        float(int(hyb[i] == SP) + int(hyb[j] == SP)) for i, j in bonds
    ]

    # ---------------- angles ----------------
    angles, a_cos0, a_lin, a_f, a_bond = [], [], [], [], []
    for c in graph.nodes:
        nbrs = sorted(graph.neighbors(c))
        for x in range(len(nbrs)):
            for y in range(x + 1, len(nbrs)):
                i, j = nbrs[x], nbrs[y]
                cos0, lin = _angle_cos0(
                    int(atomnos[c]), int(hyb[c]), int(graph.degree[c])
                )
                angles.append((i, c, j))
                a_cos0.append(cos0)
                a_lin.append(lin)
                a_f.append(float(np.sqrt(BOND_F[atomnos[i]] * BOND_F[atomnos[j]])))
                a_bond.append(
                    (bond_index[tuple(sorted((i, c)))], bond_index[tuple(sorted((j, c)))])
                )

    # ---------------- torsions ----------------
    torsions, t_n, t_bo, t_paths, t_bond = [], [], [], [], []
    for j, k in graph.edges:
        j_nb = [x for x in graph.neighbors(j) if x != k]
        k_nb = [x for x in graph.neighbors(k) if x != j]
        if not j_nb or not k_nb:
            continue
        if hyb[j] == SP or hyb[k] == SP:
            continue  # dihedral through a linear center is singular
        bo = bo_pi.get(tuple(sorted((j, k))), 0.0)
        if hyb[j] == SP3 or hyb[k] == SP3:
            n_per, bo_eff = 3.0, 0.0
        else:
            # pi / conjugated 2-fold: full pi bonds are rigid (ethylene
            # ~65 kcal/mol), partial pi (amide, biaryl) scales as BO^2
            n_per, bo_eff = 2.0, bo
        # per-quad weight against the FULLY-SUBSTITUTED reference (9 quads
        # for an sp3-sp3 bond, 4 for sp2-sp2) rather than 1/n_paths: the
        # n-fold cosine is invariant to the +-120/-+180 phase offsets
        # between quads, so every quad adds IN PHASE and barriers must grow
        # with the eclipsing-pair count. 1/n_paths gave every sp3 rotor the
        # ethane barrier; per-quad weighting predicts methanol at 3/9 and
        # methylamine at 6/9 of ethane (0.97/1.93 vs exp 1.07/1.98).
        quad_w = 1.0 / 9.0 if n_per == 3.0 else 0.25
        b_jk = bond_index[tuple(sorted((j, k)))]
        for i in j_nb:
            for l in k_nb:
                torsions.append((i, j, k, l))
                t_n.append(n_per)
                t_bo.append(bo_eff)
                t_paths.append(quad_w)
                t_bond.append(
                    (
                        bond_index[tuple(sorted((i, j)))],
                        b_jk,
                        bond_index[tuple(sorted((k, l)))],
                    )
                )

    # ---------------- out-of-plane (sp2 planarity) ----------------
    oop = []
    for c in graph.nodes:
        if hyb[c] == SP2 and graph.degree[c] == 3:
            n1, n2, n3 = sorted(graph.neighbors(c))
            oop.append((c, n1, n2, n3))

    # ---------------- pairwise class masks ----------------
    import networkx as nx

    mask_13 = np.zeros((n, n))
    mask_nb = np.ones((n, n))
    np.fill_diagonal(mask_nb, 0.0)
    sp_len = dict(nx.all_pairs_shortest_path_length(graph, cutoff=2))
    for i, dists in sp_len.items():
        for j, d in dists.items():
            if i == j:
                continue
            if d == 1:
                mask_nb[i, j] = 0.0  # the Morse well has its own wall
            elif d == 2:
                mask_nb[i, j] = 0.0
                mask_13[i, j] = 1.0

    rep_z = REP_ZEFF[atomnos][:, None] * REP_ZEFF[atomnos][None, :]
    rep_a = np.sqrt(REP_ALPHA[atomnos][:, None] * REP_ALPHA[atomnos][None, :])
    c6 = np.sqrt(C6_FREE[atomnos][:, None] * C6_FREE[atomnos][None, :])
    rvdw_sum = VDW_RADII[atomnos][:, None] + VDW_RADII[atomnos][None, :]
    disp_mask = 1.0 - np.eye(n)

    # ---------------- setup EEQ charges (for HB strengths / diagnostics) ----
    from firecode_tpu.calculators.gfnff.energy import eeq_charges_np

    q_topo = eeq_charges_np(
        coords, atomnos, float(charge),
        CHI[atomnos], ETA[atomnos], EEQ_ALPHA[atomnos], EEQ_CNF[atomnos],
        COVALENT_RADII[atomnos],
        site_b=site_b if k_ct else None, site_c=site_c, site_k=k_ct,
    )

    # ---------------- HB / XB triplets ----------------
    is_ion = abs(float(charge)) > 0.5
    # Charge-assisted HB features use the EXCESS charge relative to the
    # neutral parent (same geometry solved at charge=0, no site
    # constraint), NOT absolute setup charges: an ordinary carbonyl
    # acceptor carries q ~= -0.4 whether or not the molecule happens to be
    # an ion elsewhere, so featuring absolute q boosted every neutral-
    # region intramolecular H-bond inside an ion ~5x vs its neutral parent
    # (advisor r4 medium finding). dq localizes the boost to triplets that
    # actually hold the excess charge (NH4+ N-H donors, O of OH-).
    if is_ion:
        q_neutral = eeq_charges_np(
            coords, atomnos, 0.0,
            CHI[atomnos], ETA[atomnos], EEQ_ALPHA[atomnos], EEQ_CNF[atomnos],
            COVALENT_RADII[atomnos],
        )
        dq = q_topo - q_neutral
    else:
        dq = np.zeros(n)
    hb, hb_f, hb_sp2, hb_qd, hb_qa = [], [], [], [], []
    bonded = {tuple(sorted(e)) for e in graph.edges}
    for d in range(n):
        if int(atomnos[d]) not in _HB_DONOR_Z:
            continue
        hs = [h for h in graph.neighbors(d) if int(atomnos[h]) == 1]
        for h in hs:
            for a in range(n):
                if a in (d, h) or int(atomnos[a]) not in _HB_ACCEPTOR_Z:
                    continue
                if tuple(sorted((h, a))) in bonded:
                    continue
                f = (
                    _HB_DON_F[int(atomnos[d])]
                    * _HB_ACC_F[int(atomnos[a])]
                    * (1.0 + float(np.clip(-q_topo[a], 0.0, 1.0)))
                )
                hb.append((d, h, a))
                hb_f.append(f)
                # resonance-assisted acceptors (carbonyl/carboxyl O) get the
                # fittable khb_sp2 boost at energy time, not a baked factor
                hb_sp2.append(
                    1.0 if int(atomnos[a]) == 8 and hyb[a] == SP2 else 0.0
                )
                # 0.15 e deadzone: the soft site constraint + EEQ's
                # long-range equilibration leak ~0.1 e of apparent excess
                # onto fragments that hold none of the ion charge; genuine
                # charged sites carry 0.3+ e
                hb_qd.append(
                    float(np.clip(dq[d] + dq[h] - 0.15, 0.0, 2.0))
                    if is_ion else 0.0
                )
                hb_qa.append(
                    float(np.clip(-dq[a] - 0.15, 0.0, 2.0)) if is_ion else 0.0
                )

    xb, xb_f = [], []
    for x in range(n):
        if int(atomnos[x]) not in _XB_Z:
            continue
        cs = [c for c in graph.neighbors(x) if int(atomnos[c]) == 6]
        for cc in cs:
            for a in range(n):
                if a in (x, cc) or int(atomnos[a]) not in _XB_ACCEPTOR_Z:
                    continue
                if tuple(sorted((x, a))) in bonded:
                    continue
                xb.append((cc, x, a))
                xb_f.append(_XB_F[int(atomnos[x])])

    mask_hb_pair = np.zeros((n, n))
    for d, h, a in hb:
        mask_hb_pair[h, a] = mask_hb_pair[a, h] = 1.0
        mask_hb_pair[d, a] = mask_hb_pair[a, d] = 1.0
    for c, xx, a in xb:
        mask_hb_pair[xx, a] = mask_hb_pair[a, xx] = 1.0

    # ---------------- ATM three-body dispersion triplets ----------------
    # neighbor-capped: all three pairs within _ATM_CUTOFF at the setup
    # geometry (the r^-9 envelope makes longer triplets < 1e-4 kcal/mol
    # each). Bonded pairs are NOT excluded — the D3/D4 convention keeps
    # every triplet and lets the zero-damping kill the bonded range (f9 ~
    # 2e-7 at covalent distances); a stacking dimer's dominant triplets
    # have two atoms in one monomer. c9 = sqrt(C6_i C6_j C6_k) in a.u.,
    # converted to kcal/mol A^9.
    r_setup = np.sqrt(
        np.sum((coords[:, None, :] - coords[None, :, :]) ** 2, axis=-1)
    )
    elig = (r_setup < _ATM_CUTOFF) & ~np.eye(n, dtype=bool)
    c6_au = C6_FREE[atomnos] / AU_C6_TO_KCAL_A6
    atm_trip: list[tuple[int, int, int]] = []
    for i in range(n):
        js = np.where(elig[i])[0]
        js = js[js > i]
        for jpos, j in enumerate(js):
            ks = js[jpos + 1:]
            for k in ks[elig[j, ks]]:
                atm_trip.append((i, j, int(k)))
    if atm_trip:
        atm_arr = np.asarray(atm_trip, dtype=np.int32)
        ti, tj, tk = atm_arr[:, 0], atm_arr[:, 1], atm_arr[:, 2]
        atm_c9 = (
            np.sqrt(c6_au[ti] * c6_au[tj] * c6_au[tk]) * AU_C9_TO_KCAL_A9
        )
        atm_rvdw = np.stack(
            [rvdw_sum[ti, tj], rvdw_sum[tj, tk], rvdw_sum[ti, tk]], axis=-1
        )
    else:
        atm_arr = np.zeros((0, 3), dtype=np.int32)
        atm_c9 = np.zeros(0)
        atm_rvdw = np.zeros((0, 3))

    def arr(a, dtype=np.float64):
        return jnp.asarray(np.asarray(a, dtype=dtype))

    def pad_idx(items, width):
        # exact size — zero-length term arrays are guarded in the energy so
        # no dummy entry ever reaches a gradient (degenerate dihedrals of
        # repeated points have NaN grads)
        out = np.zeros((len(items), width), dtype=np.int32)
        for k_, it in enumerate(items):
            out[k_] = it
        return out

    return GFNFFTopology(
        atomnos=jnp.asarray(atomnos.astype(np.int32)),
        charge=float(charge),
        chi=arr(CHI[atomnos]),
        eta=arr(ETA[atomnos]),
        eeq_alpha=arr(EEQ_ALPHA[atomnos]),
        cnf=arr(EEQ_CNF[atomnos]),
        rcov=arr(COVALENT_RADII[atomnos]),
        bonds=jnp.asarray(pad_idx(bonds, 2)),
        bonds_z=jnp.asarray(
            np.asarray([[atomnos[i], atomnos[j]] for i, j in bonds], np.int32).reshape(len(bonds), 2)
        ),
        bond_rs=arr(bond_rs),
        bond_den=arr(bond_den),
        bond_bo=arr(bond_bo),
        bond_f=arr(bond_f),
        bond_sf=arr(bond_sf),
        bond_nsp=arr(bond_nsp),
        angles=jnp.asarray(pad_idx(angles, 3)),
        angle_cos0=arr(a_cos0),
        angle_lin=arr(a_lin),
        angle_f=arr(a_f),
        angle_bond=jnp.asarray(pad_idx(a_bond, 2)),
        torsions=jnp.asarray(pad_idx(torsions, 4)),
        tors_n=arr(t_n),
        tors_bo=arr(t_bo),
        tors_paths=arr(t_paths),
        tors_bond=jnp.asarray(pad_idx(t_bond, 3)),
        oop=jnp.asarray(pad_idx(oop, 4)),
        oop_f=arr(np.ones(len(oop))),
        mask_13=arr(mask_13),
        mask_nb=arr(mask_nb),
        mask_hb_pair=arr(mask_hb_pair),
        rep_z=arr(rep_z),
        rep_a=arr(rep_a),
        c6=arr(c6),
        rvdw_sum=arr(rvdw_sum),
        disp_mask=arr(disp_mask),
        hb=jnp.asarray(pad_idx(hb, 3)),
        hb_f=arr(hb_f),
        hb_sp2=arr(hb_sp2),
        hb_qd=arr(hb_qd),
        hb_qa=arr(hb_qa),
        xb=jnp.asarray(pad_idx(xb, 3)),
        xb_f=arr(xb_f),
        q_topo=arr(q_topo),
        site_b=arr(site_b),
        site_c=site_c,
        site_k=k_ct,
        atm=jnp.asarray(atm_arr),
        atm_c9=arr(atm_c9),
        atm_rvdw=arr(atm_rvdw),
    )


# --------------------------------------------------------------------------
# stacked (mixed-molecule) topologies
# --------------------------------------------------------------------------

# EEQ padding: dummy atoms must be spectators of the charge equilibration.
# A huge hardness makes their diagonal dominate, chi/cnf = 0 kills their
# electronegativity drive, and a tiny rcov zeroes their coordination-number
# coupling. Each dummy still takes q = lam/diag (lam = the real system's
# chemical potential, O(100) kcal/mol/e) at an energy cost of lam^2/(2 diag)
# — which scales as 1/eta, so 1e8 eV pins the per-dummy energy leak at
# ~3e-6 kcal/mol (1e4 eV measurably leaked 0.03 kcal/mol per dummy).
# Jacobi preconditioning in the CG solve normalizes the inflated diagonal,
# so conditioning is unaffected; the diagonal (2.3e9) is far inside f32
# range.
_EEQ_PAD_ETA = 1.0e8  # eV
_EEQ_PAD_ALPHA = 1.0  # A (avoids 1/alpha singularities)
_EEQ_PAD_RCOV = 0.05  # A


def build_stacked_gfnff_topology(
    systems: list,
    charges: list | None = None,
    n_pad: int | None = None,
) -> GFNFFTopology:
    """Per-molecule GFN-FF topologies padded to common shapes and stacked
    with a leading system axis [S, ...] — one batched device program over
    DIFFERENT molecules, each lane evaluated with its own generated force
    field (the reference optimizes multiple input files serially,
    standalone_optimizer.py:513).

    Padded term slots carry ZERO weights (bond_sf / angle_f / tors_paths /
    oop_f / hb_f / xb_f), and their index tuples point into each lane's
    dummy-atom region — pad_systems places dummies on a distant helix, so
    no padded dihedral/out-of-plane ever differentiates a degenerate
    geometry. Always reserves >= 4 dummy slots per lane for those safe
    index tuples; use with pad_systems(systems, n_pad=stacked_n_pad(...)).
    """
    sizes = [len(z) for z, _ in systems]
    n = stacked_n_pad(systems, n_pad)
    charges = list(charges) if charges is not None else [0] * len(systems)
    tops = [
        build_gfnff_topology(np.asarray(z), np.asarray(x), charge=c)
        for (z, x), c in zip(systems, charges)
    ]

    def rows(attr):
        return max(int(getattr(t, attr).shape[0]) for t in tops)

    n_b, n_a, n_t = rows("bonds"), rows("angles"), rows("torsions")
    n_o, n_h, n_x = rows("oop"), rows("hb"), rows("xb")
    n_3 = rows("atm")

    def pad_lane(t: GFNFFTopology, d0: int) -> GFNFFTopology:
        # d0: first dummy slot of this lane (distinct helix positions)
        def pad_i(a, nrows, safe):
            a = np.asarray(a)
            out = np.tile(np.asarray(safe, np.int32), (nrows, 1))
            if len(a):
                out[: len(a)] = a
            return out

        def pad_f(a, nrows, fill=0.0):
            a = np.asarray(a)
            out = np.full(nrows, fill, np.float64)
            out[: len(a)] = a
            return out

        def pad_atom(a, fill=0.0):
            a = np.asarray(a)
            out = np.full(n, fill, np.float64)
            out[: len(a)] = a
            return out

        def pad_nn(a):
            a = np.asarray(a)
            out = np.zeros((n, n))
            out[: a.shape[0], : a.shape[1]] = a
            return out

        return GFNFFTopology(
            atomnos=jnp.asarray(
                np.concatenate(
                    [np.asarray(t.atomnos), np.zeros(n - len(t.atomnos), np.int32)]
                )
            ),
            charge=jnp.asarray(float(t.charge)),
            chi=jnp.asarray(pad_atom(t.chi, 0.0)),
            eta=jnp.asarray(pad_atom(t.eta, _EEQ_PAD_ETA)),
            eeq_alpha=jnp.asarray(pad_atom(t.eeq_alpha, _EEQ_PAD_ALPHA)),
            cnf=jnp.asarray(pad_atom(t.cnf, 0.0)),
            rcov=jnp.asarray(pad_atom(t.rcov, _EEQ_PAD_RCOV)),
            bonds=jnp.asarray(pad_i(t.bonds, n_b, [d0, d0 + 1])),
            bonds_z=jnp.asarray(pad_i(t.bonds_z, n_b, [1, 1])),
            bond_rs=jnp.asarray(pad_f(t.bond_rs, n_b, fill=1.0)),
            bond_den=jnp.asarray(pad_f(t.bond_den, n_b)),
            bond_bo=jnp.asarray(pad_f(t.bond_bo, n_b)),
            bond_f=jnp.asarray(pad_f(t.bond_f, n_b)),
            bond_sf=jnp.asarray(pad_f(t.bond_sf, n_b)),  # 0 -> zero Morse depth
            bond_nsp=jnp.asarray(pad_f(t.bond_nsp, n_b)),
            angles=jnp.asarray(pad_i(t.angles, n_a, [d0, d0 + 1, d0 + 2])),
            angle_cos0=jnp.asarray(pad_f(t.angle_cos0, n_a)),
            angle_lin=jnp.asarray(pad_f(t.angle_lin, n_a)),
            angle_f=jnp.asarray(pad_f(t.angle_f, n_a)),  # 0 -> zero stiffness
            angle_bond=jnp.asarray(pad_i(t.angle_bond, n_a, [0, 0])),
            torsions=jnp.asarray(
                pad_i(t.torsions, n_t, [d0, d0 + 1, d0 + 2, d0 + 3])
            ),
            tors_n=jnp.asarray(pad_f(t.tors_n, n_t, fill=3.0)),
            tors_bo=jnp.asarray(pad_f(t.tors_bo, n_t)),
            tors_paths=jnp.asarray(pad_f(t.tors_paths, n_t)),  # 0 -> zero k
            tors_bond=jnp.asarray(pad_i(t.tors_bond, n_t, [0, 0, 0])),
            oop=jnp.asarray(pad_i(t.oop, n_o, [d0, d0 + 1, d0 + 2, d0 + 3])),
            oop_f=jnp.asarray(pad_f(t.oop_f, n_o)),  # 0 -> padded slots inert
            mask_13=jnp.asarray(pad_nn(t.mask_13)),
            mask_nb=jnp.asarray(pad_nn(t.mask_nb)),
            mask_hb_pair=jnp.asarray(pad_nn(t.mask_hb_pair)),
            rep_z=jnp.asarray(pad_nn(t.rep_z)),
            rep_a=jnp.asarray(pad_nn(t.rep_a)),
            c6=jnp.asarray(pad_nn(t.c6)),
            rvdw_sum=jnp.asarray(pad_nn(t.rvdw_sum)),
            disp_mask=jnp.asarray(pad_nn(t.disp_mask)),
            hb=jnp.asarray(pad_i(t.hb, n_h, [d0, d0 + 1, d0 + 2])),
            hb_f=jnp.asarray(pad_f(t.hb_f, n_h)),
            hb_sp2=jnp.asarray(pad_f(t.hb_sp2, n_h)),
            hb_qd=jnp.asarray(pad_f(t.hb_qd, n_h)),
            hb_qa=jnp.asarray(pad_f(t.hb_qa, n_h)),
            xb=jnp.asarray(pad_i(t.xb, n_x, [d0, d0 + 1, d0 + 2])),
            xb_f=jnp.asarray(pad_f(t.xb_f, n_x)),
            q_topo=jnp.asarray(pad_atom(t.q_topo, 0.0)),
            site_b=jnp.asarray(pad_atom(t.site_b, 0.0)),
            site_c=jnp.asarray(float(t.site_c)),
            site_k=jnp.asarray(float(t.site_k)),
            atm=jnp.asarray(pad_i(t.atm, n_3, [d0, d0 + 1, d0 + 2])),
            atm_c9=jnp.asarray(pad_f(t.atm_c9, n_3)),  # 0 -> inert slot
            atm_rvdw=jnp.asarray(
                np.concatenate(
                    [
                        np.asarray(t.atm_rvdw).reshape(-1, 3),
                        np.ones((n_3 - len(t.atm_c9), 3)),
                    ]
                )
            ),
        )

    padded = [pad_lane(t, d0) for t, d0 in zip(tops, sizes)]
    return GFNFFTopology(
        *[
            jnp.stack([getattr(t, f) for t in padded])
            for f in GFNFFTopology._fields
        ]
    )


def stacked_n_pad(systems: list, n_pad: int | None = None) -> int:
    """Common padded atom count for a stacked batch: max molecule size plus
    >= 4 guard dummy slots (safe indices for padded geometric terms)."""
    return max(int(n_pad or 0), max(len(z) for z, _ in systems) + 4)
