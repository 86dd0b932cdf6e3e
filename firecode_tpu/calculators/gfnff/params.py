"""GFN-FF parameter tables (element-wise) and global scalars.

The functional forms follow the published GFN-FF (S. Spicher, S. Grimme,
"Robust Atomistic Modeling of Materials, Organometallic, and Biochemical
Systems", Angew. Chem. Int. Ed. 2020, 59, 15665) — the generic force field
the reference runs through the xtb binary (`xtb --gfnff`,
/root/reference/firecode/calculators/xtb.py:39-283, dispatcher.py:187-260).

IMPORTANT PROVENANCE NOTE: the published element parameters ship inside the
xtb Fortran sources and are not redistributed here. The element tables below
are *re-derived in-repo*: physically-anchored starting values (Pauling
electronegativities, covalent/vdW radii, valence charges, D3-flavoured C6
coefficients) with the free global scalars in `GlobalParams` fitted against
the embedded literature-fixture dataset (firecode_tpu/calculators/gfnff/
fit.py; results recorded in ACCURACY.json and asserted by
tests/test_accuracy.py). A gated parity test against the real `xtb --gfnff`
binary runs whenever the binary is installed (tests/test_gfnff.py).

All runtime tables are Z-indexed numpy arrays (index 0 = padding slot),
following firecode_tpu.pt conventions. Units: Angstrom, kcal/mol, e, eV
where noted (converted at table-build time).
"""

from __future__ import annotations

from dataclasses import dataclass, field, fields

import numpy as np

from firecode_tpu.pt import COVALENT_RADII, MAX_Z

EV_TO_KCAL = 23.060541945329334
AU_C6_TO_KCAL_A6 = 627.509474 * 0.529177210903**6  # Eh*a0^6 -> kcal/mol*A^6

# --------------------------------------------------------------------------
# element tables (common organic set + sane fallbacks)
# --------------------------------------------------------------------------

# EEQ electronegativity chi (eV), hardness eta (eV), charge width alpha (A),
# CN-correction coefficient cnf (eV): chi_eff = chi + cnf * sqrt(CN)
_EEQ: dict[int, tuple[float, float, float, float]] = {
    #   chi     eta    alpha   cnf
    1: (4.60, 14.00, 0.80, 0.05),
    3: (3.00, 4.80, 1.50, 0.0),
    5: (5.10, 9.50, 1.30, -0.10),
    6: (5.60, 10.10, 1.20, -0.10),
    7: (7.00, 11.80, 1.10, -0.15),
    8: (8.50, 13.40, 1.00, -0.20),
    9: (10.50, 15.00, 0.90, -0.15),
    11: (2.80, 4.60, 1.70, 0.0),
    12: (3.20, 5.00, 1.60, 0.0),
    14: (4.60, 7.00, 1.60, -0.05),
    15: (5.50, 8.00, 1.50, -0.05),
    16: (6.70, 9.00, 1.45, -0.10),
    17: (8.30, 9.90, 1.30, -0.10),
    19: (2.50, 4.00, 1.90, 0.0),
    20: (3.00, 4.40, 1.80, 0.0),
    26: (4.20, 6.00, 1.60, 0.0),
    29: (4.50, 6.50, 1.50, 0.0),
    30: (4.40, 6.80, 1.50, 0.0),
    35: (7.60, 8.90, 1.50, -0.10),
    53: (6.80, 7.50, 1.70, -0.10),
}
_EEQ_FALLBACK = (5.0, 8.0, 1.5, 0.0)

# repulsion: effective nuclear charge (valence electrons) and exponent
# scale (A^-1.5). Exponents calibrated so the Pauli wall has physical reach
# at vdW CONTACT, not just at covalent range: H...H ~ 0.7 kcal/mol at 2.2 A
# and C...C ~ 0.4 at 3.4 A with krep ~ 315 — the previous (steeper) values
# left eclipsed-H and ortho-H sterics with no wall at all, which is what
# broke the butane gauche ladder and biaryl atropisomerism.
_REP: dict[int, tuple[float, float]] = {
    1: (1.0, 1.63),
    3: (1.0, 0.95),
    5: (3.0, 1.18),
    6: (4.0, 1.28),
    7: (5.0, 1.39),
    8: (6.0, 1.47),
    9: (7.0, 1.54),
    11: (1.0, 0.88),
    12: (2.0, 0.92),
    14: (4.0, 1.00),
    15: (5.0, 1.07),
    16: (6.0, 1.10),
    17: (7.0, 1.14),
    19: (1.0, 0.81),
    20: (2.0, 0.84),
    26: (8.0, 0.95),
    29: (11.0, 0.95),
    30: (2.0, 0.95),
    35: (7.0, 1.03),
    53: (7.0, 0.95),
}
_REP_FALLBACK = (4.0, 1.1)

# dispersion: free-atom-ish C6 (Eh a0^6, hybridization-typical mid-range
# D3 flavour) and Bondi vdW radii (A) for BJ damping
_DISP: dict[int, tuple[float, float]] = {
    1: (4.8, 1.20),
    3: (800.0, 1.82),
    5: (60.0, 1.92),
    6: (25.0, 1.70),
    7: (17.0, 1.55),
    8: (12.0, 1.52),
    9: (8.0, 1.47),
    11: (1200.0, 2.27),
    12: (500.0, 1.73),
    14: (160.0, 2.10),
    15: (130.0, 1.80),
    16: (110.0, 1.80),
    17: (85.0, 1.75),
    19: (2000.0, 2.75),
    20: (1500.0, 2.31),
    26: (380.0, 2.00),
    29: (250.0, 1.40),
    30: (230.0, 1.39),
    35: (130.0, 1.85),
    53: (250.0, 1.98),
}
_DISP_FALLBACK = (60.0, 1.80)

# Pauling electronegativities (for the bond-length EN correction)
_PAULING: dict[int, float] = {
    1: 2.20, 3: 0.98, 5: 2.04, 6: 2.55, 7: 3.04, 8: 3.44, 9: 3.98,
    11: 0.93, 12: 1.31, 14: 1.90, 15: 2.19, 16: 2.58, 17: 3.16,
    19: 0.82, 20: 1.00, 26: 1.83, 29: 1.90, 30: 1.65, 35: 2.96, 53: 2.66,
}
_PAULING_FALLBACK = 2.0

# X-H bond r0 correction (A): heavier p-block hydrides bond through nearly
# pure p orbitals, so X-H is shorter than the shared-radius sum tuned on
# X-C bonds (S-H exp 1.336 vs S radius solved from C-S 1.819 predicting
# 1.39). Additive EN cannot absorb it (dEN(S,H) = 0.38 is tiny). Zero for
# H/C/N/O — their radii are solved exactly from the X-H lengths already.
# Halogens solved jointly with their bond radii against the CH3X / HX
# experimental pairs (CCCBDB): the radius zeroes C-X, this offset zeroes
# H-X; the correction grows down the group as expected for pure-p bonding.
_RH_OFF: dict[int, float] = {
    9: -0.036,
    16: -0.050,
    17: -0.086,
    35: -0.096,
    53: -0.104,
}
_RH_OFF_FALLBACK = 0.0

# element bond-strength factor (sqrt-combined into the Morse well depth);
# roughly tracks homolytic single-bond energies
_BOND_F: dict[int, float] = {
    1: 1.06, 5: 0.95, 6: 1.00, 7: 0.88, 8: 0.80, 9: 0.75,
    14: 0.85, 15: 0.85, 16: 0.80, 17: 0.75, 35: 0.70, 53: 0.65,
}
_BOND_F_FALLBACK = 0.8

# per-element Morse STRETCH factor (sqrt-combined into the bond well
# depth, separate from BOND_F which also sets angle stiffness):
# calibrated by least squares against 21 experimental stretching force
# constants (calibrate_stretch.py; 6.7% rms in k, so harmonic stretch
# frequencies land within ~3-4% typical). kb_pi (GlobalParams) is
# calibrated jointly.
_STRETCH_F: dict[int, float] = {
    1: 0.550, 5: 1.0, 6: 1.065, 7: 1.165, 8: 1.210, 9: 1.589,
    14: 1.05, 15: 1.050, 16: 1.493, 17: 1.639, 35: 1.604, 53: 1.524,
}
_STRETCH_F_FALLBACK = 1.0


def _table(d: dict, fallback, idx: int) -> np.ndarray:
    def get(z):
        v = d.get(z, fallback)
        return v[idx] if isinstance(v, tuple) else v

    return np.array([0.0] + [get(z) for z in range(1, MAX_Z + 1)])


CHI = _table(_EEQ, _EEQ_FALLBACK, 0)  # eV
ETA = _table(_EEQ, _EEQ_FALLBACK, 1)  # eV
EEQ_ALPHA = _table(_EEQ, _EEQ_FALLBACK, 2)  # A
EEQ_CNF = _table(_EEQ, _EEQ_FALLBACK, 3)  # eV
REP_ZEFF = _table(_REP, _REP_FALLBACK, 0)
REP_ALPHA = _table(_REP, _REP_FALLBACK, 1)  # A^-1.5 exponent element part
C6_FREE = _table(_DISP, _DISP_FALLBACK, 0) * AU_C6_TO_KCAL_A6  # kcal/mol A^6
VDW_RADII = _table(_DISP, _DISP_FALLBACK, 1)  # A
EN_PAULING = _table(_PAULING, _PAULING_FALLBACK, 0)
BOND_F = _table(_BOND_F, _BOND_F_FALLBACK, 0)
STRETCH_F = _table(_STRETCH_F, _STRETCH_F_FALLBACK, 0)
RH_OFF = _table(_RH_OFF, _RH_OFF_FALLBACK, 0)

# hybridization-dependent covalent radius scale (sp3, sp2, sp)
HYB_R_SCALE = np.array([1.0, 0.95, 0.905])


def _default_bond_radii() -> np.ndarray:
    """Per-element bond radii: covalent radii with H/C/N/O solved exactly
    from the experimental C-C/C-H/O-H/C-O/N-H lengths together with the
    additive EN correction (ken ~ 0.07 * dEN^1.5):
        2 rC = 1.536; rC + rH - 0.073*0.21 = 1.091;
        rO + rH - 0.073*1.38 = 0.958; rC + rO - 0.073*0.84 = 1.427 + ...
    -> rH 0.339, rC 0.768, rN 0.729, rO 0.720. The fit polishes from here."""
    r = COVALENT_RADII.copy()
    r[1] = 0.339
    r[6] = 0.768
    r[7] = 0.729
    r[8] = 0.720
    return r


# --------------------------------------------------------------------------
# global scalars (the fitted degrees of freedom)
# --------------------------------------------------------------------------


@dataclass
class GlobalParams:
    """Free global parameters of the native GFN-FF. Defaults are the
    committed fit (firecode_tpu/calculators/gfnff/fit.py ->
    data/gfnff_fit.npz); physics-anchored starting values documented
    inline. `bond_radii` is the per-element bond-radius table (initialised
    at the covalent radii; the fit adjusts it to zero the bond-force
    residuals at the experimental geometries)."""

    bond_radii: np.ndarray = field(
        default_factory=lambda: _default_bond_radii()
    )
    # per-element r0 shift applied to X-H bonds only (see _RH_OFF)
    rh_off: np.ndarray = field(default_factory=lambda: RH_OFF.copy())

    # bond Morse well: depth = kb_s * sqrt(sf_A sf_B) * (1 + kb_pi * BO_pi),
    # width a = kb_a / r0 (dimensionless steepness); sf from STRETCH_F
    kb_s: float = 85.0  # kcal/mol  (C-C sigma ~ 83)
    # calibrated jointly with STRETCH_F against experimental stretching
    # force constants (calibrate_stretch.py) — not a fit.py degree of
    # freedom, or a geometry refit would silently detune the frequencies
    kb_pi: float = 1.0202
    kb_a: float = 2.68  # Morse a*r0 (ethane k ~ 650 kcal/mol/A^2)
    # bond length: r0 = (rA + rB - ken * dEN^1.5), additive EN shortening
    ken: float = 0.07
    kr_q: float = 0.0  # charge correction on r0 (off by default)
    kr_pi: float = 0.14  # pi-bond contraction fraction (C=C 1.52 -> 1.33)
    # per-sp-atom sigma-bond contraction (A), gated by (1 - BO_pi) in the
    # energy: alkyne C-H 1.061 vs sp3 1.091 (one sp atom), propyne
    # H3C-C#CH central C-C 1.459 vs 1.536 — s-character shortens sigma
    # bonds to sp centers; anchored on the alkyne/nitrile fixture set
    kr_sp: float = 0.045
    # X-H bonds at sp centers contract LESS than heavy-heavy sp sigma
    # bonds (alkyne C-H relaxed 1.047 vs exp 1.061 under a shared kr_sp)
    kr_sp_h: float = 0.031
    # extra contraction of triple bonds beyond the linear kr_pi*BO law
    # (C#C relaxed 1.236 vs exp 1.203), fading with bond polarity (C#N
    # only needs ~1/3 of it — EN shortening already carries part):
    # trip_con = kr_triple * max(BO-1, 0) * max(1 - kt_en * dEN, 0)
    kr_triple: float = 0.0836
    kt_en: float = 1.32
    # angles: E = ka * sqrt(fA fB) * damp * (cos t - cos t0)^2
    ka_s: float = 55.0
    ka_lin: float = 28.0  # linear-center prefactor on (1 + cos t)
    # torsions (per rotable bond, split over paths)
    kt_sp3: float = 1.45  # 3-fold barrier ~ 2.9 kcal/mol (ethane)
    kt_pi: float = 32.0  # 2-fold pi barrier ~ 65 (ethylene)
    kt_bo_exp: float = 2.0  # BO->stiffness exponent (amides anchor it ~3)
    kt_conj: float = 3.0  # conjugated single bonds (biaryl / diene)
    kt_damp: float = 4.0  # bond-stretch damping steepness
    # out-of-plane (sp2 planarity): E = koop * h^2
    koop: float = 18.0
    # repulsion: E = krep * ZA ZB / r * exp(-sqrt(aA aB) * r^1.5)
    krep: float = 315.0
    krep_13: float = 0.35  # scale on 1-3 pairs (angles carry most of it)
    krep_nb: float = 1.0  # scale on >=1-4 pairs
    krep_hb: float = 0.15  # softening on HB donor/acceptor pairs
    # dispersion: BJ-damped C6 (+C8-ish via s8 on the same kernel)
    s6: float = 1.0
    a1: float = 0.45
    a2: float = 1.6  # R0 = a1*(rvdwA+rvdwB) + a2 [A]
    s8: float = 1.2  # strength of the r^-8 channel
    s9: float = 1.0  # ATM three-body strength (D4 convention; 0 = off)
    # ATM zero-damping radius scale on the vdW radii sums: 0.85 puts the
    # benzene-sandwich (3.9 A) ATM interaction at +0.22 kcal/mol — the D3
    # literature value — while intramolecular triplet sums stay ~0.01
    # kcal/mol (the two-body fit absorbed that range into bonded terms)
    katm_r0: float = 0.85
    # EEQ electrostatics
    es_scale: float = 1.0
    # hydrogen bond correction (on top of EEQ+disp)
    khb: float = 2.8  # kcal/mol base strength
    khb_sp2: float = 2.0  # resonance-assisted boost on sp2-O acceptors
    #   (anchored on the formic-acid cyclic dimer De 18.6, CCSD(T)/CBS)
    khb_w: float = 1.4  # Gaussian width (A^-2) around r0_hb
    # charge-assisted H-bond boosts (ion topologies only; strength factor
    # 1 + khb_qd*clip(dq_d+dq_h-0.15,0,2) + khb_qa*clip(-dq_a-0.15,0,2),
    # where dq is the EXCESS EEQ charge vs the same geometry solved
    # neutral — so the boost localizes to triplets that actually hold the
    # ion charge, and a remote neutral-region H-bond inside a large ion is
    # NOT boosted (advisor r4; pinned by
    # test_remote_neutral_hb_in_ion_not_charge_boosted). The 0.15 e
    # deadzone zeroes the soft-site-constraint/EEQ long-range leak.
    # Fitted by secant solves (scripts/fit_cahb.py) against the
    # CCSD(T)-quality charged-HB binding anchors: NH4+...OH2 De 20.5
    # (err +0.02) and HO-...H2O De 26.7 (err +0.05) — both complexes were
    # UNBOUND (-4.4 / -9.1 kcal/mol) before the term (the EEQ
    # partial-charge scale cannot carry ion-dipole attraction through the
    # ES term). Neutral chemistry is untouched: the features are zero
    # unless |total charge| > 0.5.
    khb_qd: float = 45.398
    khb_qa: float = 25.416
    r0_hb: float = 1.90  # H...A target distance (A)
    # halogen bond correction
    kxb: float = 1.5
    r0_xb: float = 2.90

    def asdict(self) -> dict:
        out = {}
        for f in fields(self):
            v = getattr(self, f.name)
            out[f.name] = np.asarray(v) if np.ndim(v) else float(v)
        return out

    @classmethod
    def fromdict(cls, d: dict) -> "GlobalParams":
        valid = {f.name for f in fields(cls)}
        kw = {}
        for k, v in d.items():
            if k not in valid:
                continue
            kw[k] = np.asarray(v, dtype=np.float64) if np.ndim(v) else float(v)
        return cls(**kw)


def load_fitted() -> GlobalParams:
    """Committed fit if present (data/gfnff_fit.npz), else defaults."""
    import os

    path = os.path.join(os.path.dirname(__file__), "data", "gfnff_fit.npz")
    if os.path.exists(path):
        with np.load(path) as z:
            return GlobalParams.fromdict({k: z[k] for k in z.files})
    return GlobalParams()


# Site-constrained charge-transfer stiffness (kcal/mol/e^2) for ion
# workflows (GFNFFTopology.site_b): the soft penalty interpolates between
# free atom-space EEQ (k=0, molecular capacitance grows with size ->
# larger ions overstabilized by tens of kcal/mol) and fully frozen
# inter-group transfer (k -> inf). Fitted by 1-D scan against the
# gas-phase ion fixtures (fixtures.ION_DIAGNOSTICS ddep/dpa class deltas,
# full relaxed calc; scripts/fit_kct.py): MAD over the 5 deltas was
# 25.2 (k=0) / 6.9 (500) / 3.0 (900) / 3.7 (1300) / 4.2 (1800) kcal/mol
# — a clear interior minimum at k ~ 900, where every within-class delta
# lands inside +-3 kcal/mol of experiment.
K_CT = 900.0
