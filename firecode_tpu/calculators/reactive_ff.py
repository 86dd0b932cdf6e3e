"""LiteFF-R: a reactive, topology-free batched potential in pure JAX.

The reference obtains a reactive potential energy surface from the external
GFN-class binaries (firecode/calculators/xtb.py:39-347, dispatcher.py:187-260)
— every bond can break or form. LiteFF (calculators/forcefield.py) cannot do
that: its harmonic bonds are perceived once from the input frame and are
topologically frozen. LiteFF-R removes the topology entirely; every energy
term is a smooth function of interatomic distances alone, so the same
expression describes reactants, products, and everything between — NEB bands,
saddle points, IRC paths, and bond-breaking scans run on a genuine reactive
surface. The functional form is GFN-FF/ReaxFF-flavored but deliberately small:

- pair term: Morse with the ATTRACTIVE branch scaled by a smooth free-valence
  saturation factor s_ij in [0, 1] (the repulsive wall is never scaled, so
  crowded atoms always repel). s_ij multiplies how much spare valence atom i
  has for j (its valence V_i minus its coordination excluding j) by the same
  quantity for j — an overcoordinated atom smoothly stops binding further
  partners, which is what creates exchange/substitution barriers (e.g. the
  H2 + H identity reaction or an SN2 at carbon);
- bond order BO_ij via the D3-style smooth counting function; coordination
  number CN_i = sum_j BO_ij;
- angle bending over ALL triples, weighted by BO_ji * BO_jk so angle terms
  appear and disappear continuously with the bonds themselves; the reference
  angle cos(theta0) interpolates over CN from a per-element hybridization
  table (sp -> sp2 -> sp3 geometry follows the coordination, smoothly);
- pi correction: short-Gaussian extra binding for pairs of atoms that BOTH
  have leftover valence (unsaturation), shared among eligible neighbors so an
  aromatic ring does not triple-count its pi electrons;
- electrostatics: geometry-dependent EEQ charges (the same Ohno-damped KKT
  solve as calculators/solvation.py:qeq_charges) with the full EEQ energy
  expression — differentiable through the linear solve;
- dispersion: damped London tail gated by (1 - BO) to avoid double counting.

Units: Angstrom in, kcal/mol out; zero of energy = separated neutral atoms
(up to the well-known EEQ long-range charge-transfer artifact). The model is
qualitative by design: minima sit near covalent-radii geometries, barriers
are real and smooth with a single imaginary mode at simple exchange saddles
(see tests/test_reactive_ff.py), but barrier heights are not quantitative —
the xtb host hatch remains the oracle for that (calculators/xtb_io.py).

- torsional pi rigidity: the anisotropic part of the pi well is gated by the
  alignment of per-atom pi-plane tensors (see the PI_TWIST block), so
  alkene/amide/biaryl rotations have real barriers (ethylene ~50 kcal/mol)
  while sigma-framework torsions stay soft.

Not modeled: spin states, charge-transfer asymptotics, quantitative barrier
heights. For pure conformer work the non-reactive LiteFF
is the default and is better behaved; the dispatcher exposes this surface as
CALC=LITEFF-R for the reaction-path operators (neb>, saddle>, scan>, irc).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from firecode_tpu.calculators.base import Calculator
from firecode_tpu.calculators.forcefield import UFF_D, UFF_X
from firecode_tpu.calculators.solvation import CHI, ETA, COULOMB, EV_TO_KCAL
from firecode_tpu.pt import COVALENT_RADII, MAX_Z

# --- per-element parameter tables (Z-indexed dense arrays) -------------------

_VALENCE: dict[int, float] = {
    1: 1, 2: 0, 3: 1, 4: 2, 5: 3, 6: 4, 7: 3, 8: 2, 9: 1, 10: 0,
    11: 1, 12: 2, 13: 3, 14: 4, 15: 3, 16: 2, 17: 1, 18: 0,
    19: 1, 20: 2, 35: 1, 53: 1,
}
VALENCE = np.array([_VALENCE.get(z, 4.0) for z in range(MAX_Z + 1)], dtype=np.float64)

# homonuclear single-bond dissociation energies (kcal/mol), textbook values
_D_HOMO: dict[int, float] = {
    1: 104.0, 3: 25.0, 5: 70.0, 6: 83.0, 7: 38.0, 8: 35.0, 9: 37.0,
    11: 17.0, 14: 52.0, 15: 48.0, 16: 54.0, 17: 58.0, 35: 46.0, 53: 36.0,
}
D_HOMO = np.array([_D_HOMO.get(z, 50.0) for z in range(MAX_Z + 1)], dtype=np.float64)

_EN_PAULING: dict[int, float] = {
    1: 2.20, 3: 0.98, 4: 1.57, 5: 2.04, 6: 2.55, 7: 3.04, 8: 3.44, 9: 3.98,
    11: 0.93, 12: 1.31, 13: 1.61, 14: 1.90, 15: 2.19, 16: 2.58, 17: 3.16,
    19: 0.82, 20: 1.00, 35: 2.96, 53: 2.66,
}
EN_PAULING = np.array([_EN_PAULING.get(z, 2.0) for z in range(MAX_Z + 1)], dtype=np.float64)

# reference angle cos(theta0) per element over the CN grid [2, 3, 4, 5, 6];
# linear interpolation in CN between grid points, clamped at the ends
_COS0_GRID_CN = np.array([2.0, 3.0, 4.0, 5.0, 6.0])


def _deg(vals):
    return [float(np.cos(np.radians(v))) for v in vals]


_COS0_BY_Z: dict[int, list[float]] = {
    1: _deg([180, 180, 180, 180, 180]),
    6: _deg([180, 120, 109.47, 100, 90]),
    7: _deg([120, 107, 109.47, 100, 90]),
    8: _deg([104.5, 109.47, 109.47, 90, 90]),
    15: _deg([95, 93.5, 109.47, 100, 90]),
    16: _deg([92, 95, 109.47, 90, 90]),
    9: _deg([180, 180, 180, 180, 180]),
    17: _deg([180, 180, 180, 180, 180]),
    35: _deg([180, 180, 180, 180, 180]),
    53: _deg([180, 180, 180, 180, 180]),
}
_COS0_DEFAULT = _deg([120, 109.47, 109.47, 100, 90])
COS0_TABLE = np.array(
    [_COS0_BY_Z.get(z, _COS0_DEFAULT) for z in range(MAX_Z + 1)], dtype=np.float64
)

# pair-specific equilibrium-length overrides (covalent-radii sums are tuned
# for heavy-atom bonds; H-H needs the true H2 length)
_R0_PAIR_OVERRIDE: dict[tuple[int, int], float] = {(1, 1): 0.741}

# --- model constants ---------------------------------------------------------

ALPHA = 1.8       # Morse width (1/A); k_bond = 2 D alpha^2 ~ 500 kcal/mol/A^2
BETA_BO = 3.0     # Gaussian bond-order width (1/A^2) in the stretch dr
SP_SHARP = 8.0    # softplus sharpness clamping dr < 0 to ~0 in the bond order
VAL_X1 = 0.92     # spare-valence level above which the gate is fully open
VAL_C = 4.0       # Gaussian-in-deficit gate curvature
VAL_SHARP = 10.0  # softplus sharpness clamping negative deficit to ~0
PI_A = 6.0        # pi leftover-valence sigmoid steepness
PI_X0 = 0.5       # pi leftover-valence sigmoid offset
K_ANG = 130.0     # angle force constant (kcal/mol per unit cos^2)
ANG_COS_GATE = 0.45  # smooth cutoff: no angle penalty for cos(theta) above this
ANG_GATE_SHARP = 8.0
PI_DEPTH = 0.25   # isotropic pi well depth as a fraction of the sigma D_ij
PI_R0 = 0.87      # pi well center as a fraction of the sigma r0_ij
PI_WIDTH = 16.0   # pi Gaussian width (1/A^2)
PI_SHARE_EPS = 0.02
PI_TWIST = 0.70   # anisotropic (plane-alignment-gated) pi depth fraction:
                  # twisting a full pi bond by 90 deg costs ~ PI_TWIST * D_ij
                  # (ethylene ~ 0.7 * 83 * s_pi ~ 50 kcal/mol, cf. exp ~65)


class ReactiveParams(NamedTuple):
    """Geometry-independent tables for one composition, device-resident."""

    r0: jnp.ndarray        # f[N, N] pair reference lengths
    d: jnp.ndarray         # f[N, N] pair well depths (Pauling-corrected)
    valence: jnp.ndarray   # f[N]
    chi: jnp.ndarray       # f[N] EEQ electronegativities (eV)
    eta: jnp.ndarray       # f[N] EEQ hardnesses (eV)
    cos0_tbl: jnp.ndarray  # f[N, 5] reference angle cosines over the CN grid
    lj_x6: jnp.ndarray     # f[N, N] dispersion length^6
    lj_d: jnp.ndarray      # f[N, N] dispersion depth
    charge: jnp.ndarray    # f[] total molecular charge


def build_reactive_params(atomnos: np.ndarray, charge: float = 0.0) -> ReactiveParams:
    atomnos = np.asarray(atomnos)
    rc = COVALENT_RADII[atomnos]
    r0 = rc[:, None] + rc[None, :]
    for (za, zb), val in _R0_PAIR_OVERRIDE.items():
        mask = (atomnos[:, None] == za) & (atomnos[None, :] == zb)
        r0 = np.where(mask | mask.T, val, r0)

    d_h = D_HOMO[atomnos]
    en = EN_PAULING[atomnos]
    # Pauling's equation: D_AB = sqrt(D_AA * D_BB) + 23 (chi_A - chi_B)^2
    d = np.sqrt(d_h[:, None] * d_h[None, :]) + 23.0 * (en[:, None] - en[None, :]) ** 2

    x = UFF_X[atomnos]
    dd = UFF_D[atomnos]
    lj_x6 = (np.sqrt(x[:, None] * x[None, :])) ** 6
    lj_d = np.sqrt(dd[:, None] * dd[None, :])

    j = jnp.asarray
    return ReactiveParams(
        r0=j(r0), d=j(d), valence=j(VALENCE[atomnos]),
        chi=j(CHI[atomnos]), eta=j(ETA[atomnos]),
        cos0_tbl=j(COS0_TABLE[atomnos]),
        lj_x6=j(lj_x6), lj_d=j(lj_d),
        charge=j(float(charge)),
    )


def _pair_bond_order(r: jnp.ndarray, r0: jnp.ndarray, off: jnp.ndarray) -> jnp.ndarray:
    """Gaussian-in-stretch bond order: ~1 for r <= r0, exp(-beta dr^2) beyond.

    The Gaussian profile is deliberately range-matched to the Morse attraction
    (BETA_BO vs ALPHA): a TS-stretched bond (dr ~ 0.3 A) keeps BO ~ 0.8 so the
    valence gate SEES it and can saturate the atom, while a geminal 1-3
    contact (dr ~ 1 A) is already below 0.05 and does not pollute the
    coordination count. A sigmoid-in-r counting function (D3-style) cannot do
    both at once — it decays much faster than the Morse attraction, which
    left H3 bound in an early version of this model.
    """
    dr = jnp.log1p(jnp.exp(SP_SHARP * (r - r0))) / SP_SHARP  # smooth max(dr, 0)
    return off * jnp.exp(-BETA_BO * dr * dr)


def bond_orders(coords: jnp.ndarray, params: ReactiveParams) -> jnp.ndarray:
    """Smooth pair bond orders BO[N, N] (0 on the diagonal)."""
    n = coords.shape[0]
    diff = coords[:, None, :] - coords[None, :, :]
    r = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + jnp.eye(n, dtype=coords.dtype) + 1e-12)
    off = 1.0 - jnp.eye(n, dtype=coords.dtype)
    return _pair_bond_order(r, params.r0, off)


def reactive_energy_terms(coords: jnp.ndarray, params: ReactiveParams) -> dict:
    """Per-term breakdown of the LiteFF-R energy (kcal/mol); pure, autodiff-safe."""
    n = coords.shape[0]
    eye = jnp.eye(n, dtype=coords.dtype)
    off = 1.0 - eye
    diff = coords[:, None, :] - coords[None, :, :]
    r2 = jnp.sum(diff * diff, axis=-1) + eye  # safe diagonal
    r = jnp.sqrt(r2 + 1e-12)

    # bond orders and coordination numbers (see _pair_bond_order for why the
    # profile is Gaussian in the stretch)
    bo = _pair_bond_order(r, params.r0, off)
    cn = jnp.sum(bo, axis=1)

    # free-valence saturation: how much bonding capacity i has left for j,
    # excluding the i-j bond itself from i's coordination. The gate is a
    # Gaussian in the smoothly-clamped valence DEFICIT rather than a sigmoid
    # in the spare valence: a sigmoid's residual slope at spare ~ 1 made
    # every bond's strength drift with its neighbors' coordination (in an
    # early version, stretching ethane's C-C bond strengthened the six C-H
    # bonds enough to hold the C-C at +0.4 A); the Gaussian gate is exactly
    # flat once spare >= VAL_X1 and calibrated below it so the H2 + H
    # identity exchange keeps a positive barrier (~4 kcal/mol at the
    # collinear saddle, see tests/test_reactive_ff.py)
    spare = params.valence[:, None] - (cn[:, None] - bo)
    deficit = jnp.log1p(jnp.exp(VAL_SHARP * (VAL_X1 - spare))) / VAL_SHARP
    free = jnp.exp(-VAL_C * deficit * deficit)
    s = free * free.T  # symmetric in (i, j)

    # Morse pair term: unscaled repulsive wall, valence-gated attraction
    dr = r - params.r0
    e_rep = jnp.exp(-2.0 * ALPHA * dr)
    e_att = -2.0 * s * jnp.exp(-ALPHA * dr)
    e_pair = 0.5 * jnp.sum(off * params.d * (e_rep + e_att))

    # angle bending over all triples, BO-weighted; theta0 follows CN_j
    un = diff / r[:, :, None]  # un[j, i] = unit(x_j - x_i)
    cos_jik = jnp.einsum("jid,jkd->jik", un, un)
    cn_frac = jnp.clip(cn, _COS0_GRID_CN[0], _COS0_GRID_CN[-1]) - _COS0_GRID_CN[0]
    idx = jnp.clip(cn_frac.astype(jnp.int32), 0, len(_COS0_GRID_CN) - 2)
    t = cn_frac - idx
    row = jnp.arange(n)
    cos0 = params.cos0_tbl[row, idx] * (1.0 - t) + params.cos0_tbl[row, idx + 1] * t
    # weight by the SQUARED bond-order product: a geminal 1-3 contact with
    # BO ~ 0.05 would otherwise still pick up a huge (cos - cos0)^2 deviation
    # (it sits at ~35 deg from the real bond) and distort the geometry; the
    # square pushes such phantom angle terms to ~1e-3 of a real one while a
    # real angle (BO ~ 0.97 per leg) keeps ~0.9 weight
    w = (bo[:, :, None] * bo[:, None, :]) ** 2  # w[j, i, k]
    tri_mask = (
        off[:, :, None] * off[:, None, :]
        * (1.0 - jnp.eye(n, dtype=coords.dtype))[None, :, :]
    )
    # smooth cos gate: a real angle never closes below ~60 deg (the Morse
    # wall prevents it), but a phantom triple whose second leg is a weak
    # geminal contact sits at ~35 deg from the real bond with cos ~ 0.8 and a
    # (cos - cos0)^2 of ~3 — enough residual energy to bend real geometry
    # (it widened the water angle to ~125 deg before this gate). Suppressing
    # everything above cos ~ 0.45 removes those while leaving all chemical
    # angles (>60 deg) untouched.
    gate = jax.nn.sigmoid(ANG_GATE_SHARP * (ANG_COS_GATE - cos_jik))
    dev = cos_jik - cos0[:, None, None]
    e_ang = 0.5 * K_ANG * jnp.sum(w * tri_mask * gate * dev * dev)

    # pi correction: leftover total valence shared among close unsaturated
    # neighbors (so a ring cannot multiply-count its pi capacity)
    leftover = jax.nn.sigmoid(PI_A * (params.valence - cn - PI_X0))
    w_pi = off * jnp.exp(-4.0 * (r / (PI_R0 * params.r0) - 1.0) ** 2)
    # share pi capacity among close UNSATURATED partners only: weighting the
    # competition by the partner's own leftover keeps saturated neighbors
    # (e.g. the four H of ethylene) from diluting the C=C share
    w_pi_eff = w_pi * leftover[None, :]
    share = leftover[:, None] * w_pi_eff / (
        jnp.sum(w_pi_eff, axis=1, keepdims=True) + PI_SHARE_EPS
    )
    s_pi = jnp.sqrt(share * share.T + 1e-18)
    gauss = jnp.exp(-PI_WIDTH * (r - PI_R0 * params.r0) ** 2)

    # torsional pi rigidity (topology-free): each atom j carries, per
    # partner k, a PSD "pi-plane tensor" M_j = sum_i BO_ji m m^T with
    # m = u_jk x u_ji (per-neighbor normal; the squared outer product kills
    # the cross-product sign ambiguity that makes any LINEAR normal sum
    # cancel on symmetric sp2 centers). The normalized alignment
    # A = Tr[M_j M_k] / (|M_j| |M_k|) is cos^2 of the twist angle for a
    # clean double bond: 1 planar, 0 at 90 deg — so the anisotropic part of
    # the pi well (PI_TWIST) switches off on twisting. This is what gives
    # alkene/amide/biaryl rotation real barriers (VERDICT r2 item 6);
    # terminal-pi pairs (C=O) have M=0 on one side and are unaffected.
    # O(N^2) form: with m = u_jk x u_ji = S(u_jk) u_ji (S = skew matrix),
    # M_j^(k) = sum_i bo_ji m m^T = S(u_jk) P_j S(u_jk)^T where
    # P_j = sum_i bo_ji u_ji u_ji^T is per-ATOM — the naive [j, k, i, 3]
    # cross tensor is cubic in N and OOMs NEB/saddle batches past ~150 atoms
    zeros = jnp.zeros_like(un[..., 0])
    skew = jnp.stack(
        [
            jnp.stack([zeros, -un[..., 2], un[..., 1]], axis=-1),
            jnp.stack([un[..., 2], zeros, -un[..., 0]], axis=-1),
            jnp.stack([-un[..., 1], un[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )  # [j, k, 3, 3], skew @ v = u_jk x v
    p_tens = jnp.einsum("ji,jia,jib->jab", bo, un, un)  # [j, 3, 3]
    m_big = jnp.einsum("jkab,jbc,jkdc->jkad", skew, p_tens, skew)
    align_num = jnp.einsum("jkab,kjab->jk", m_big, m_big)
    m_norm = jnp.sqrt(jnp.einsum("jkab,jkab->jk", m_big, m_big) + 1e-18)
    align = align_num / (m_norm * m_norm.T + 1e-9)

    # the sigma saturation gate s also multiplies the pi well: without it,
    # pi-driven ring contraction inflates second-neighbor bond orders, which
    # inflates CN, which (unchecked) runs away into a collapsed carbon blob
    # (observed on biphenyl); with the gate the contraction closes its own
    # valence and the pi attraction self-limits
    e_pi = -0.5 * jnp.sum(
        off * params.d * s * s_pi * gauss * (PI_DEPTH + PI_TWIST * align)
    )

    # EEQ electrostatics: Ohno-damped KKT solve (same kernel as qeq_charges),
    # then the full EEQ energy with the solved charges
    chi_k = params.chi * EV_TO_KCAL
    eta_k = params.eta * EV_TO_KCAL
    gamma_len = COULOMB / (0.5 * (eta_k[:, None] + eta_k[None, :]))
    j_off = off * COULOMB / jnp.sqrt(r2 + gamma_len**2)
    a = j_off + jnp.diag(eta_k)
    ones = jnp.ones((n, 1), dtype=coords.dtype)
    kkt = jnp.block([[a, ones], [ones.T, jnp.zeros((1, 1), coords.dtype)]])
    rhs = jnp.concatenate([-chi_k, params.charge[None].astype(coords.dtype)])
    q = jnp.linalg.solve(kkt, rhs)[:n]
    e_eeq = jnp.sum(chi_k * q) + 0.5 * jnp.sum(q * (a @ q))

    # damped dispersion, gated off where a sigma bond already binds the pair
    e_disp = -0.5 * jnp.sum(
        off * (1.0 - bo) * 2.0 * params.lj_d * params.lj_x6 / (r2**3 + params.lj_x6)
    )

    return {"pair": e_pair, "angle": e_ang, "pi": e_pi, "eeq": e_eeq, "disp": e_disp}


def reactive_energy(coords: jnp.ndarray, params: ReactiveParams) -> jnp.ndarray:
    """Total LiteFF-R energy of one structure (kcal/mol). Pure; autodiff-safe."""
    terms = reactive_energy_terms(coords, params)
    return terms["pair"] + terms["angle"] + terms["pi"] + terms["eeq"] + terms["disp"]


def eeq_charges(coords: jnp.ndarray, params: ReactiveParams) -> jnp.ndarray:
    """Solved EEQ charges for one structure (diagnostic accessor)."""
    n = coords.shape[0]
    eye = jnp.eye(n, dtype=coords.dtype)
    diff = coords[:, None, :] - coords[None, :, :]
    r2 = jnp.sum(diff * diff, axis=-1) + eye
    chi_k = params.chi * EV_TO_KCAL
    eta_k = params.eta * EV_TO_KCAL
    gamma_len = COULOMB / (0.5 * (eta_k[:, None] + eta_k[None, :]))
    j_off = (1.0 - eye) * COULOMB / jnp.sqrt(r2 + gamma_len**2)
    a = j_off + jnp.diag(eta_k)
    ones = jnp.ones((n, 1), dtype=coords.dtype)
    kkt = jnp.block([[a, ones], [ones.T, jnp.zeros((1, 1), coords.dtype)]])
    rhs = jnp.concatenate([-chi_k, params.charge[None].astype(coords.dtype)])
    return jnp.linalg.solve(kkt, rhs)[:n]


class ReactiveFF(Calculator):
    """Calculator facade over reactive_energy: no topology, bonds can form/break."""

    def __init__(self, atomnos: np.ndarray, charge: float = 0.0):
        self.params = build_reactive_params(atomnos, charge)
        params = self.params
        super().__init__(lambda c: reactive_energy(c, params), name="liteff-r")
