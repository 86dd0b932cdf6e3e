"""GFN-FF energy terms as pure batched JAX functions.

E = E_bond + E_angle + E_torsion + E_oop + E_rep + E_ES(EEQ) + E_disp
    + E_HB + E_XB

following the term structure of the published GFN-FF (Spicher & Grimme,
Angew. Chem. Int. Ed. 2020, 59, 15665) with two documented deviations:

- the bonded stretch is a Morse well (identical equilibrium/curvature/
  dissociation behaviour to the paper's Gaussian-well-plus-bonded-repulsion
  pair, but with the inner wall built in — one term instead of two);
- the three-body ATM dispersion term (included since r5, on by default) is
  neighbor-capped at topology setup (6 A) and uses D3-style zero damping
  on 0.85x vdW-sum radii rather than the paper's exact damping — the
  benzene-sandwich ATM interaction matches D3's +0.22 kcal/mol; A/B over
  the 87 anchors: all green before and after (ACCURACY.json).

The electrostatics is a *variational* EEQ: atomic charges re-equilibrate at
every geometry through a (N+1)x(N+1) KKT solve (erf-damped kernel,
CN-corrected electronegativities), and autodiff through the solve yields
exact analytic forces — the same property the Fortran implementation gets
from the variational principle.

The energy is differentiable BOTH in the coordinates (forces/Hessians) and
in the global parameters `p` (a dict mirroring params.GlobalParams) — the
topology carries only structural data. fit.py exploits the latter to train
the global scalars against the embedded literature fixtures.

Reference capability: `xtb --gfnff` driven by
/root/reference/firecode/calculators/xtb.py:39-283.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from firecode_tpu.calculators.gfnff.params import EV_TO_KCAL

COULOMB = 332.0637  # kcal/mol * A / e^2
_CN_K = 7.5  # CN error-function steepness (D4 flavour)


# --------------------------------------------------------------------------
# coordination number + EEQ charges
# --------------------------------------------------------------------------


def coordination_numbers(coords: jnp.ndarray, rcov: jnp.ndarray) -> jnp.ndarray:
    """Smooth CN per atom: sum of erf counting functions (D4 flavour)."""
    n = coords.shape[0]
    diff = coords[:, None, :] - coords[None, :, :]
    r = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
    r0 = rcov[:, None] + rcov[None, :]
    cnt = 0.5 * (1.0 + jax.scipy.special.erf(-_CN_K * (r / r0 - 1.0)))
    cnt = jnp.where(jnp.eye(n, dtype=bool), 0.0, cnt)
    return jnp.sum(cnt, axis=1)


def _eeq_system(
    coords, chi, eta, alpha, cnf, rcov, charge,
    site_b=None, site_c=0.0, site_k=0.0,
):
    """Build the EEQ KKT matrix/rhs for one structure (kcal/mol units).

    site_b/site_c/site_k: optional site-constrained charge-transfer penalty
    (site_k/2)(site_b . q - site_c)^2 — the ion-energetics fix (see
    GFNFFTopology.site_b). Folding it here keeps every solve path (direct,
    variational CG, warm PCG) consistent: the penalty is a rank-1 SPD
    update of A plus a shift of chi_eff, and callers add the constant
    (site_k/2) site_c^2 to the energy."""
    n = coords.shape[0]
    diff = coords[:, None, :] - coords[None, :, :]
    r = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
    # floor pair distances at 0.3 A inside the charge kernel: two (nearly)
    # coincident atoms otherwise make identical KKT rows and the f32 LU on
    # TPU returns NaN charges, poisoning the lane. No fixture geometry has
    # contacts anywhere near 0.3 A, so chemistry is untouched.
    r = jnp.maximum(r, 0.3)
    gamma = jnp.sqrt(alpha[:, None] ** 2 + alpha[None, :] ** 2)
    j_off = COULOMB * jax.scipy.special.erf(r / gamma) / r
    diag = eta * EV_TO_KCAL + COULOMB * jnp.sqrt(2.0 / jnp.pi) / alpha
    a = jnp.where(jnp.eye(n, dtype=bool), 0.0, j_off) + jnp.diag(diag)
    cn = coordination_numbers(coords, rcov)
    chi_eff = (chi + cnf * jnp.sqrt(cn + 1e-12)) * EV_TO_KCAL
    if site_b is not None:
        b = site_b.astype(a.dtype)
        a = a + site_k * b[:, None] * b[None, :]
        chi_eff = chi_eff - site_k * site_c * b
    return a, chi_eff


def _site_const(site_b, site_c, site_k, dtype):
    """The energy constant (site_k/2) site_c^2 completed by _eeq_system's
    chi shift — per-system, so it matters for species-to-species deltas."""
    if site_b is None:
        return jnp.asarray(0.0, dtype)
    return jnp.asarray(0.5, dtype) * site_k * site_c * site_c


# fixed CG iteration counts for the EEQ solve: the Jacobi-preconditioned EEQ
# matrix is superbly conditioned (measured cond ~14 on hexadecane; the erf
# damping + hardness diagonal keep it so for any geometry the 0.3 A floor
# admits), so 10 iterations reach 1e-7 and 24 reach f64 machine precision.
# The count is picked by dtype — f32 (the TPU production path) hits f32
# machine precision by 10-12 iterations (measured: 8 already matches 24 to
# display precision on hexadecane distorted by 0.25 A noise), so the f64
# count would just double the per-step EEQ cost for zero extra accuracy.
# Static counts keep the loop shape-stable under vmap/jit.
_EEQ_CG_ITERS = 24  # f64: machine precision
_EEQ_CG_ITERS_F32 = 12  # f32: machine precision, ~2x cheaper

# warm-start refresh count for the optimizer fast path (see
# eeq_energy_charges_warm): between FIRE steps the geometry moves by at
# most _MAXSTEP, so the carried solution is already within ~1e-3 of the
# new one; with the Jacobi-PCG contraction (~0.3-0.5x per iteration) six
# iterations hold the steady-state residual at dtype machine precision.
_EEQ_WARM_ITERS = 6


def _dtype_cg_iters(dtype) -> int:
    return _EEQ_CG_ITERS_F32 if dtype == jnp.float32 else _EEQ_CG_ITERS


def _pcg_refine(a, b, x0, iters: int):
    """Jacobi-preconditioned CG on SPD a @ x = b [N, K] from guess x0.

    Plain fori_loop — the caller decides differentiation (custom_linear_solve
    for the variational path, stop_gradient for the warm optimizer path)."""
    dinv = (1.0 / jnp.diagonal(a))[:, None]
    eps = jnp.asarray(1e-30, a.dtype)
    r0 = b - a @ x0
    z0 = dinv * r0
    rz0 = jnp.sum(r0 * z0, axis=0)

    def body(_i, st):
        x, r, p_, rz = st
        ap = a @ p_
        al = rz / (jnp.sum(p_ * ap, axis=0) + eps)
        x = x + al * p_
        r = r - al * ap
        z = dinv * r
        rz_new = jnp.sum(r * z, axis=0)
        beta = rz_new / (rz + eps)
        return x, r, z + beta * p_, rz_new

    x, _, _, _ = lax.fori_loop(0, iters, body, (x0, r0, z0, rz0))
    return x


def _eeq_solve(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve SPD a @ x = b (b: [N, K]) by Jacobi-preconditioned CG under
    lax.custom_linear_solve.

    Versus the previous Cholesky: every CG step is a batched [N, N] @ [N, K]
    matmul — MXU work that vmaps into one big batched GEMM per iteration —
    where XLA's Cholesky lowers to a serial panel loop that starved the MXU
    (measured 8.4x gap between variational and frozen-charge GFN-FF
    optimization throughput, mostly this solve). custom_linear_solve gives
    the exact implicit derivative rules: the backward pass is one more CG
    solve with the same matrix (symmetric), never a differentiated
    factorization, and JVPs compose so jax.hessian stays exact."""
    dinv = (1.0 / jnp.diagonal(a))[:, None]

    def matvec(x):
        return a @ x

    def solve(_mv, rhs):
        # diagonal guess: right scale, costs one iteration
        return _pcg_refine(a, rhs, dinv * rhs, _dtype_cg_iters(a.dtype))

    return lax.custom_linear_solve(matvec, b, solve, symmetric=True)


def eeq_energy_and_charges(
    coords, chi, eta, alpha, cnf, rcov, charge,
    site_b=None, site_c=0.0, site_k=0.0,
):
    """Variational EEQ electrostatic energy (kcal/mol) + charges [N].

    The total-charge constraint is eliminated by the Schur complement
    instead of solving the bordered (N+1) KKT system: A is SPD (erf-damped
    Coulomb kernel + positive hardness diagonal), so one SPD solve with two
    right-hand sides gives
        q = A^-1(-chi) + lam A^-1 1,   lam = (Q + 1^T A^-1 chi)/(1^T A^-1 1)
    — ~2x cheaper than LU on the bordered (and indefinite) matrix, and
    exactly the same minimizer. The solve itself is MXU-friendly CG (see
    _eeq_solve)."""
    a, chi_eff = _eeq_system(
        coords, chi, eta, alpha, cnf, rcov, charge, site_b, site_c, site_k
    )
    s = _eeq_solve(a, jnp.stack([-chi_eff, jnp.ones_like(chi_eff)], axis=-1))
    s1, s2 = s[:, 0], s[:, 1]
    lam = (charge - jnp.sum(s1)) / jnp.sum(s2)
    q = s1 + lam * s2
    e = jnp.sum(chi_eff * q) + 0.5 * q @ (a @ q)
    return e + _site_const(site_b, site_c, site_k, e.dtype), q


def _eeq_rhs(chi_eff):
    return jnp.stack([-chi_eff, jnp.ones_like(chi_eff)], axis=-1)


def eeq_warm_init(
    coords, chi, eta, alpha, cnf, rcov, charge,
    site_b=None, site_c=0.0, site_k=0.0,
):
    """Cold-start EEQ warm state s[N, 2]: full-precision PCG from the
    diagonal guess. Gradient-free (stop_gradient) — the state is an
    optimizer carry, not a differentiable quantity."""
    a, chi_eff = _eeq_system(
        coords, chi, eta, alpha, cnf, rcov, charge, site_b, site_c, site_k
    )
    b = _eeq_rhs(chi_eff)
    dinv = (1.0 / jnp.diagonal(a))[:, None]
    s = _pcg_refine(a, b, dinv * b, _dtype_cg_iters(a.dtype))
    return lax.stop_gradient(s)


def eeq_energy_charges_warm(
    coords, chi, eta, alpha, cnf, rcov, charge, s_prev,
    iters: int = _EEQ_WARM_ITERS,
    site_b=None, site_c=0.0, site_k=0.0,
):
    """EEQ energy with a warm-started, gradient-detached charge solve —
    the optimizer fast path (see GFNFF.energy_and_forces_state).

    The carried solution pair s_prev [N, 2] (A^-1(-chi), A^-1 1) is
    refreshed with `iters` PCG iterations and detached with stop_gradient;
    the energy is then the variational quadratic form at fixed q. That
    makes the coordinate gradient exactly Hellmann-Feynman:

        dE/dx = dE/dx|_q + (dE/dq) . (dq/dx)

    and the second term vanishes because (a) E_ES is stationary in q at
    the EEQ solution up to the CG residual, and (b) the total-charge
    constraint is enforced EXACTLY by the Schur recombination below
    (lam is computed from the refreshed s, so sum(q) = Q holds for any
    residual), killing the Lagrange-multiplier component. Force error is
    therefore first order in the CG residual only — at steady state under
    an optimizer (geometry moves <= _MAXSTEP per step) the residual sits
    at dtype machine precision.

    Versus the variational path (custom_linear_solve), this removes the
    ENTIRE backward CG solve and cuts the forward count 2x: ~4x fewer
    EEQ matvecs per optimization step, on the term that dominates the
    GFN-FF step cost. Not valid for Hessians/frequencies (those need the
    dq/dx response — use the variational path)."""
    a, chi_eff = _eeq_system(
        coords, chi, eta, alpha, cnf, rcov, charge, site_b, site_c, site_k
    )
    s = _pcg_refine(
        lax.stop_gradient(a),
        lax.stop_gradient(_eeq_rhs(chi_eff)),
        lax.stop_gradient(s_prev),
        iters,
    )
    s = lax.stop_gradient(s)
    s1, s2 = s[:, 0], s[:, 1]
    lam = (charge - jnp.sum(s1)) / jnp.sum(s2)
    q = s1 + lam * s2
    e = jnp.sum(chi_eff * q) + 0.5 * q @ (a @ q)
    return e + _site_const(site_b, site_c, site_k, e.dtype), q, s


def eeq_charges_np(
    coords, atomnos, charge, chi, eta, alpha, cnf, rcov,
    site_b=None, site_c=0.0, site_k=0.0,
) -> np.ndarray:
    """Host (setup-time) EEQ charges — used for HB strength generation."""
    del atomnos
    _, q = eeq_energy_and_charges(
        jnp.asarray(coords), jnp.asarray(chi), jnp.asarray(eta),
        jnp.asarray(alpha), jnp.asarray(cnf), jnp.asarray(rcov), float(charge),
        site_b=None if site_b is None else jnp.asarray(site_b),
        site_c=site_c, site_k=site_k,
    )
    return np.asarray(q)


# --------------------------------------------------------------------------
# total energy
# --------------------------------------------------------------------------


def bond_params(top, p):
    """(r0, depth, steepness) per bond from structural data + globals."""
    radii = jnp.asarray(p["bond_radii"])
    zi, zj = top.bonds_z[:, 0], top.bonds_z[:, 1]
    rs = radii[zi] + radii[zj]
    # X-H bonds of heavier p-block elements are shorter than the shared
    # radius sum (near-pure-p bonding); per-element correction, 0 for CHNO
    rh_off = jnp.asarray(p["rh_off"])
    rs = rs + jnp.where(zj == 1, rh_off[zi], 0.0) + jnp.where(zi == 1, rh_off[zj], 0.0)
    # additive Pauling-style EN shortening (|dEN|^1.5): a multiplicative
    # form cannot satisfy C-C/C-H/O-H/C-O simultaneously with shared radii.
    # Sigma bonds to sp centers contract further with s-character (alkyne
    # C-H 1.061, propyne C-C 1.459); gated by (1 - BO_pi) so the triple
    # bond itself, already contracted via kr_pi, is not double-counted.
    # X-H bonds at sp centers use the weaker kr_sp_h (one shared kr_sp
    # left sp C-H 0.014 A too short while heavy-heavy sp sigma bonds were
    # right — r5 sp-force work, ACCURACY force_rms acetylene/propyne/hcn).
    is_h = (zi == 1) | (zj == 1)
    k_sp_eff = jnp.where(is_h, p["kr_sp_h"], p["kr_sp"])
    sp_con = k_sp_eff * top.bond_nsp * jnp.maximum(1.0 - top.bond_bo, 0.0)
    # triple bonds (BO_pi > 1) contract beyond the linear kr_pi*BO law;
    # the extra contraction fades with bond polarity (C#N needs a third of
    # the C#C correction — its EN shortening already carries part of it)
    trip_con = (
        p["kr_triple"]
        * jnp.maximum(top.bond_bo - 1.0, 0.0)
        * jnp.maximum(1.0 - p["kt_en"] * top.bond_den, 0.0)
    )
    r0 = (rs - p["ken"] * top.bond_den ** 1.5 - sp_con - trip_con) * (
        1.0 - p["kr_pi"] * top.bond_bo
    )
    # well depth from the force-constant-calibrated stretch table
    # (calibrate_stretch.py): k = 2 d a^2 matches experimental stretching
    # force constants to ~7% rms, so harmonic frequencies are quantitative
    d = p["kb_s"] * top.bond_sf * (1.0 + p["kb_pi"] * top.bond_bo)
    a = p["kb_a"] / r0
    return r0, d, a


def gfnff_energy_terms(
    coords: jnp.ndarray, top, p: dict, eeq: str = "variational"
) -> dict:
    """Per-term breakdown of the GFN-FF energy (kcal/mol); pure,
    autodiff-safe — the diagnostic surface mirroring
    reactive_ff.reactive_energy_terms.

    eeq: "variational" re-equilibrates charges at every geometry through
    the KKT solve (exact charge-flow forces, O(N^3) per evaluation);
    "topo" freezes the setup-geometry EEQ charges and evaluates the same
    erf-damped Coulomb pairwise — the published GFN-FF's behaviour
    (charges from topology, not geometry) and the fast path for large-N
    batched optimization (no linear solve under the step loop);
    "none" skips the ES term entirely — internal mode for
    gfnff_energy_warm, which adds the warm-started detached EEQ term
    externally."""
    dt = coords.dtype
    zero = jnp.asarray(0.0, dtype=dt)
    terms = {
        k: zero for k in
        ("bond", "angle", "torsion", "oop", "rep", "disp", "es", "hb", "xb")
    }
    e = zero

    def dist(idx_a, idx_b):
        d = coords[idx_a] - coords[idx_b]
        return jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-12)

    def bond_damp(r, r0):
        # smoothly releases angle/torsion strain as a bond breaks.
        # jax.nn.sigmoid, not 1/(1+exp(u)): padded terms in stacked batches
        # evaluate this at r/r0 ~ 7 where exp(u) overflows f32 and the
        # naive form's gradient goes inf/inf -> NaN (sigmoid's saturated
        # gradient is exactly 0)
        return jax.nn.sigmoid(-p["kt_damp"] * (r / (1.35 * r0) - 1.0) * 8.0)

    bond_r0, bond_d, bond_a = bond_params(top, p)

    # ---- bonds: Morse ----
    if top.bonds.shape[0]:
        r = dist(top.bonds[:, 0], top.bonds[:, 1])
        x = jnp.exp(-bond_a * (r - bond_r0))
        terms["bond"] = jnp.sum(bond_d * (x * x - 2.0 * x))

    # ---- angles ----
    if top.angles.shape[0]:
        ai = coords[top.angles[:, 0]]
        ac = coords[top.angles[:, 1]]
        aj = coords[top.angles[:, 2]]
        v1 = ai - ac
        v2 = aj - ac
        r1 = jnp.sqrt(jnp.sum(v1 * v1, axis=-1) + 1e-12)
        r2 = jnp.sqrt(jnp.sum(v2 * v2, axis=-1) + 1e-12)
        cosb = jnp.sum(v1 * v2, axis=-1) / (r1 * r2)
        damp = bond_damp(r1, bond_r0[top.angle_bond[:, 0]]) * bond_damp(
            r2, bond_r0[top.angle_bond[:, 1]]
        )
        k = jnp.where(top.angle_lin > 0.5, p["ka_lin"], p["ka_s"]) * top.angle_f
        bent = (cosb - top.angle_cos0) ** 2
        lin = 1.0 + cosb
        terms["angle"] = jnp.sum(k * damp * jnp.where(top.angle_lin > 0.5, lin, bent))

    # ---- torsions ----
    if top.torsions.shape[0]:
        phi = _dihedral_rad(coords, top.torsions)
        rij = dist(top.torsions[:, 0], top.torsions[:, 1])
        rjk = dist(top.torsions[:, 1], top.torsions[:, 2])
        rkl = dist(top.torsions[:, 2], top.torsions[:, 3])
        tdamp = (
            bond_damp(rij, bond_r0[top.tors_bond[:, 0]])
            * bond_damp(rjk, bond_r0[top.tors_bond[:, 1]])
            * bond_damp(rkl, bond_r0[top.tors_bond[:, 2]])
        )
        # BO->stiffness exponent is fitted (kt_bo_exp): bo^2 left amides
        # (bo ~0.57) 1.8x too stiff once ethylene (bo=1) was anchored.
        # Clamp bo away from 0 so the exponent's ln-gradient cannot NaN
        # through the unselected branch of the where.
        bo_safe = jnp.maximum(top.tors_bo, 1e-6)
        k_total = jnp.where(
            top.tors_n > 2.5,
            p["kt_sp3"],
            p["kt_conj"] + p["kt_pi"] * bo_safe ** p["kt_bo_exp"],
        )
        k = k_total * top.tors_paths
        # sp3 (n=3): 1 + cos(3 phi) -> staggered minima at 60/180/300;
        # pi   (n=2): 1 - cos(2 phi) -> planar minima at 0/180
        sign = jnp.where(top.tors_n > 2.5, 1.0, -1.0)
        terms["torsion"] = jnp.sum(k * tdamp * (1.0 + sign * jnp.cos(top.tors_n * phi)))

    # ---- out-of-plane ----
    if top.oop.shape[0]:
        c = coords[top.oop[:, 0]]
        p1 = coords[top.oop[:, 1]]
        p2 = coords[top.oop[:, 2]]
        p3 = coords[top.oop[:, 3]]
        nrm = jnp.cross(p2 - p1, p3 - p1)
        nrm = nrm / (jnp.linalg.norm(nrm, axis=-1, keepdims=True) + 1e-12)
        h = jnp.sum((c - p1) * nrm, axis=-1)
        terms["oop"] = jnp.sum(p["koop"] * top.oop_f * h * h)

    # ---- pairwise: repulsion + dispersion ----
    diff = coords[:, None, :] - coords[None, :, :]
    r2m = jnp.sum(diff * diff, axis=-1)
    rm = jnp.sqrt(r2m + 1e-12)
    rep_scale = p["krep_13"] * top.mask_13 + p["krep_nb"] * top.mask_nb
    # HB-pair softening: charge transfer lets H...O/N contacts sit far
    # inside the nonpolar vdW wall (the wall itself stays hard elsewhere)
    rep_scale = rep_scale * (
        1.0 - (1.0 - p["krep_hb"]) * top.mask_hb_pair
    )
    erep = (
        p["krep"] * rep_scale * top.rep_z / rm * jnp.exp(-top.rep_a * rm**1.5)
    )
    disp_r0 = p["a1"] * top.rvdw_sum + p["a2"]
    # cap pair distances at 100 A inside the dispersion kernel: beyond that
    # -C6/r^6 is < 1e-12 kcal/mol, but the BACKWARD pass squares r^6 and
    # (10^19)^2 overflows f32 to inf -> 0*inf = NaN. Mixed-molecule stacked
    # batches place padding dummies ~1700 A out (forcefield.pad_systems),
    # which is exactly where the unclamped gradient poisoned every lane.
    r2d = jnp.minimum(r2m, 1.0e4)
    r6 = r2d * r2d * r2d
    r0_6 = disp_r0**6
    r0_8 = r0_6 * disp_r0 * disp_r0
    # 1-2/1-3 pairs are excluded from dispersion (standard FF convention):
    # with a fitted BJ radius, bonded-range -C6/r^6 slopes acted as a bond
    # compressor (every C-C relaxed ~0.05 A short of its anchored r0)
    edisp = -top.mask_nb * top.c6 * (
        p["s6"] / (r6 + r0_6) + p["s8"] * disp_r0**2 / (r6 * r2d + r0_8)
    )
    terms["rep"] = 0.5 * jnp.sum(erep)
    terms["disp"] = 0.5 * jnp.sum(edisp)

    # ---- ATM three-body dispersion (Axilrod-Teller-Muto) ----
    # E9 = s9 * sum_{i<j<k} C9 (3 cos ti cos tj cos tk + 1) / (rij rjk rik)^3
    # with D3-style zero damping f9 = 1/(1 + 6 ((4/3) rbar0/rbar)^16),
    # rbar/rbar0 the geometric means of the pair distances / BJ radii.
    # Triplets are neighbor-capped at topology setup (topology.py
    # _ATM_CUTOFF); cos terms via the law of cosines, so only the three
    # gathered pair distances are needed.
    if top.atm.shape[0]:
        ti, tj, tk = top.atm[:, 0], top.atm[:, 1], top.atm[:, 2]
        rij = rm[ti, tj]
        rjk = rm[tj, tk]
        rik = rm[ti, tk]
        r2ij, r2jk, r2ik = rij * rij, rjk * rjk, rik * rik
        cosi = (r2ij + r2ik - r2jk) / (2.0 * rij * rik)
        cosj = (r2ij + r2jk - r2ik) / (2.0 * rij * rjk)
        cosk = (r2ik + r2jk - r2ij) / (2.0 * rik * rjk)
        ang = 3.0 * cosi * cosj * cosk + 1.0
        # cap the distance product: stacked-batch padding dummies sit
        # ~1700 A out and the BACKWARD pass squares rprod^3 — (1e29)^2
        # overflows f32 to inf and 0 * inf = NaN (cf. the r2d cap above).
        # Real capped triplets contribute < 1e-18 kcal/mol.
        rprod = jnp.minimum(rij * rjk * rik, 1.0e6)
        # damping radii = katm_r0 * vdW radii sums (the D3 R0AB cutoff
        # convention; D3 cutoffs are ~0.85 of vdW sums) — NOT the fitted
        # two-body BJ radii a1*rvdw+a2, which are far too small here
        # (f9 = 0.24 on intramolecular H-H-H triplets): the two-body fit
        # absorbed short-range dispersion into the bonded terms, so ATM
        # must stay out of that range. Calibration: params.katm_r0.
        r0 = p["katm_r0"] * top.atm_rvdw  # [T3, 3]
        ratio2 = (
            (16.0 / 9.0)
            * (r0[:, 0] * r0[:, 1] * r0[:, 2] / rprod) ** (2.0 / 3.0)
        )
        r16 = ratio2**8  # ((4/3) rbar0 / rbar)^16
        f9 = 1.0 / (1.0 + 6.0 * r16)
        terms["atm"] = p["s9"] * jnp.sum(
            top.atm_c9 * ang * f9 / (rprod * rprod * rprod)
        )

    # ---- EEQ electrostatics ----
    if eeq == "none":
        # ES added externally (gfnff_energy_warm's detached warm solve)
        e_es = zero
    elif eeq == "topo":
        # fixed setup charges: damped pairwise Coulomb only (the chi/eta
        # self-energy is geometry-independent at fixed q -> constant, dropped)
        q = top.q_topo.astype(dt)
        alpha = top.eeq_alpha.astype(dt)
        gamma = jnp.sqrt(alpha[:, None] ** 2 + alpha[None, :] ** 2)
        rm_es = jnp.maximum(rm, 0.3)  # same degeneracy floor as _eeq_system
        j_off = COULOMB * jax.scipy.special.erf(rm_es / gamma) / rm_es
        off = jnp.where(jnp.eye(coords.shape[0], dtype=bool), 0.0, j_off)
        e_es = 0.5 * q @ (off @ q)
    else:
        e_es, _q = eeq_energy_and_charges(
            coords,
            top.chi.astype(dt), top.eta.astype(dt), top.eeq_alpha.astype(dt),
            top.cnf.astype(dt), top.rcov.astype(dt), top.charge,
            site_b=top.site_b, site_c=top.site_c, site_k=top.site_k,
        )
    terms["es"] = p["es_scale"] * e_es

    # ---- hydrogen bonds ----
    if top.hb.shape[0]:
        hd = coords[top.hb[:, 0]]
        hh = coords[top.hb[:, 1]]
        ha = coords[top.hb[:, 2]]
        vhd = hd - hh
        vha = ha - hh
        rhd = jnp.sqrt(jnp.sum(vhd * vhd, axis=-1) + 1e-12)
        rha = jnp.sqrt(jnp.sum(vha * vha, axis=-1) + 1e-12)
        cos_dha = jnp.sum(vhd * vha, axis=-1) / (rhd * rha)
        f_ang = ((1.0 - cos_dha) * 0.5) ** 4  # 1 at linear D-H...A, 0 at 0 deg
        f_dist = jnp.exp(-p["khb_w"] * (rha - p["r0_hb"]) ** 2)
        # resonance-assisted boost on sp2-O acceptors (carbonyl/carboxyl):
        # plain element factors underbind acid dimers by ~6 kcal/mol.
        # Charge-assisted boost (hb_qd/hb_qa nonzero only on ion
        # topologies): cationic donors / anionic acceptors bind 3-5x their
        # neutral analogs (fitted on NH4+...OH2 / HO-...H2O, CCSD(T) De)
        strength = top.hb_f * (
            1.0 + (p["khb_sp2"] - 1.0) * top.hb_sp2
            + p["khb_qd"] * top.hb_qd + p["khb_qa"] * top.hb_qa
        )
        terms["hb"] = -jnp.sum(p["khb"] * strength * f_ang * f_dist)

    # ---- halogen bonds ----
    if top.xb.shape[0]:
        xc = coords[top.xb[:, 0]]
        xx = coords[top.xb[:, 1]]
        xa = coords[top.xb[:, 2]]
        vxc = xc - xx
        vxa = xa - xx
        rxc = jnp.sqrt(jnp.sum(vxc * vxc, axis=-1) + 1e-12)
        rxa = jnp.sqrt(jnp.sum(vxa * vxa, axis=-1) + 1e-12)
        cos_cxa = jnp.sum(vxc * vxa, axis=-1) / (rxc * rxa)
        fx_ang = ((1.0 - cos_cxa) * 0.5) ** 4  # sigma-hole directionality
        fx_dist = jnp.exp(-p["khb_w"] * (rxa - p["r0_xb"]) ** 2)
        terms["xb"] = -jnp.sum(p["kxb"] * top.xb_f * fx_ang * fx_dist)

    del e
    return terms


def gfnff_energy(
    coords: jnp.ndarray, top, p: dict, eeq: str = "variational"
) -> jnp.ndarray:
    """Total GFN-FF energy of one structure [N, 3] (kcal/mol).

    p: dict of global scalars (params.GlobalParams.asdict()); may be traced
    (the fit differentiates the energy with respect to it). See
    gfnff_energy_terms for the eeq modes."""
    terms = gfnff_energy_terms(coords, top, p, eeq=eeq)
    return sum(terms.values())


def gfnff_energy_warm(
    coords: jnp.ndarray, top, p: dict, s_prev: jnp.ndarray,
    iters: int = _EEQ_WARM_ITERS,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Total GFN-FF energy with the warm-started detached EEQ solve.

    Returns (energy, refreshed EEQ state s [N, 2]). The optimizer fast
    path: gradients in coords are exact Hellmann-Feynman forces up to the
    CG residual (see eeq_energy_charges_warm); NOT valid for Hessians."""
    dt = coords.dtype
    terms = gfnff_energy_terms(coords, top, p, eeq="none")
    e_es, _q, s_new = eeq_energy_charges_warm(
        coords,
        top.chi.astype(dt), top.eta.astype(dt), top.eeq_alpha.astype(dt),
        top.cnf.astype(dt), top.rcov.astype(dt), top.charge,
        s_prev, iters,
        site_b=top.site_b, site_c=top.site_c, site_k=top.site_k,
    )
    return sum(terms.values()) + p["es_scale"] * e_es, s_new


def _dihedral_rad(coords: jnp.ndarray, quads: jnp.ndarray) -> jnp.ndarray:
    """Signed dihedral (radians) for index quadruplets [T, 4]."""
    from firecode_tpu.ops.algebra import dihedral

    return jnp.radians(dihedral(coords[quads]))


def gfnff_charges(coords: jnp.ndarray, top) -> jnp.ndarray:
    """Runtime EEQ charges for one structure (diagnostic surface)."""
    _, q = eeq_energy_and_charges(
        coords, top.chi.astype(coords.dtype), top.eta.astype(coords.dtype),
        top.eeq_alpha.astype(coords.dtype), top.cnf.astype(coords.dtype),
        top.rcov.astype(coords.dtype), top.charge,
        site_b=top.site_b, site_c=top.site_c, site_k=top.site_k,
    )
    return q
