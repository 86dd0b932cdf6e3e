"""Fixture-accuracy report for the native calculators -> ACCURACY.json.

Evaluates every literature target in fixtures.TARGETS with the committed
GFN-FF fit: relaxed geometries (batched FIRE), rigid torsion ladders, and
dimer binding energies, plus the force residuals at the experimental
geometries. Writes ACCURACY.json at the repo root (the artifact VERDICT r2
items 1/3/9 ask for) and prints a human-readable table.

Run:  python -m firecode_tpu.calculators.gfnff.accuracy [--write]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def ion_class_deltas(k_ct: float | None = None) -> dict:
    """Gas-phase ion class deltas (kcal/mol) with the site-constrained EEQ
    (full calculator, relaxed geometries): the K_CT fit target set and the
    ACCURACY anchors. k_ct None -> the committed params.K_CT."""
    import jax.numpy as jnp

    from firecode_tpu.calculators.gfnff import GFNFF, fixtures as fx
    from firecode_tpu.driver.pka import deprotonate, protonate
    from firecode_tpu.graphs import graphize
    from firecode_tpu.opt.fire import optimize_batch

    def relax_e(z, x, charge=0, site=None, target=None):
        calc = GFNFF(
            np.asarray(z), np.asarray(x), charge=charge,
            charge_site=site, site_charge_target=target, site_k=k_ct,
        )
        res = optimize_batch(calc, jnp.asarray(x)[None], fmax=0.05,
                             max_steps=2000)
        return float(res.energy[0]), np.asarray(res.coords[0])

    def e_dep(zx, h_idx):
        z, x = np.asarray(zx[0]), np.asarray(zx[1])
        e0, x0 = relax_e(z, x, 0)
        q0 = GFNFF(z, x0).charges(x0)
        g = graphize(z, x0)
        heavy = next(j for j in g.neighbors(h_idx) if z[j] != 1)
        za, xa = deprotonate(z, x0, h_idx)
        heavy_new = heavy - (1 if h_idx < heavy else 0)
        target = float(q0[heavy] + q0[h_idx] - 1.0)
        e1, _ = relax_e(za, xa, -1, site=[heavy_new], target=target)
        return e1 - e0

    def e_prot(zx, heavy_idx):
        z, x = np.asarray(zx[0]), np.asarray(zx[1])
        e0, x0 = relax_e(z, x, 0)
        q0 = GFNFF(z, x0).charges(x0)
        zp, xp = protonate(z, x0, heavy_idx)
        # site = the protonated heavy atom + the new H (it carries real
        # positive charge); target = neutral heavy charge + the proton
        target = float(q0[heavy_idx] + 1.0)
        e1, _ = relax_e(zp, xp, +1, site=[heavy_idx, len(zp) - 1],
                        target=target)
        return e0 - e1

    d_formic = e_dep(fx.formic_acid(), 4)
    d_acetic = e_dep(fx.acetic_acid(), 3)
    d_meoh = e_dep(fx.methanol(), 2)
    d_etoh = e_dep(fx.ethanol(), 2)
    d_h2o = e_dep(fx.water(), 1)
    p_nh3 = e_prot(fx.ammonia(), 0)
    p_ma = e_prot(fx.methylamine(), 1)
    return {
        "ddep_water_minus_methanol": d_h2o - d_meoh,
        "ddep_methanol_minus_ethanol": d_meoh - d_etoh,
        "ddep_acetic_minus_formic": d_acetic - d_formic,
        "dpa_methylamine_minus_ammonia": p_ma - p_nh3,
        "ddep_methanol_minus_formic": d_meoh - d_formic,
        "acidity_ordering_ok": bool(d_formic < d_meoh < d_h2o),
        "pa_ordering_ok": bool(p_ma > p_nh3),
    }


def _angle(x, i, c, j) -> float:
    v1, v2 = x[i] - x[c], x[j] - x[c]
    cos = v1 @ v2 / (np.linalg.norm(v1) * np.linalg.norm(v2))
    return float(np.degrees(np.arccos(np.clip(cos, -1, 1))))


def compute_report() -> dict:
    import jax
    import jax.numpy as jnp

    from firecode_tpu.calculators.gfnff import GFNFF, fixtures as fx
    from firecode_tpu.calculators.gfnff.energy import gfnff_energy
    from firecode_tpu.calculators.gfnff.fit import _build_cases
    from firecode_tpu.calculators.gfnff.params import load_fitted
    from firecode_tpu.opt.fire import optimize_batch

    p = load_fitted().asdict()
    cases = _build_cases()
    report: dict = {"calculator": "GFNFF", "targets": {}}

    def rec(name, value):
        tgt, tol = fx.TARGETS[name]
        report["targets"][name] = {
            "value": round(float(value), 3),
            "target": tgt,
            "tol": tol,
            "ok": bool(abs(float(value) - tgt) <= tol),
        }

    # ---- force residuals at experimental geometries ----
    fres = {}
    for name, c in cases.items():
        g = jax.grad(gfnff_energy)(c["x"], c["top"], p)
        fres[name] = round(float(jnp.sqrt(jnp.mean(jnp.sum(g * g, -1)))), 2)
    report["force_rms_at_exp_geometry_kcal_mol_A"] = fres

    # ---- torsion ladders (rigid, from reference geometries) ----
    def scan_e(name):
        c = cases[name]
        return np.asarray(
            jax.vmap(lambda x: gfnff_energy(x, c["top"], p))(c["scan"])
        )

    ee = scan_e("ethane")
    rec("ethane_barrier", ee[1] - ee[0])
    ef = scan_e("formamide")
    rec("formamide_rotation", ef[1] - ef[0])
    ev = scan_e("ethylene")
    rec("ethylene_twist", ev[1] - ev[0])
    eb = scan_e("butane")
    rec("butane_gauche", eb[2] - eb[0])
    rec("butane_syn_barrier", eb[3] - eb[0])

    # ---- dimer binding ----
    for name, key in (
        ("methane_dimer", "methane_dimer_de"),
        ("water_dimer", "water_dimer_de"),
        ("formic_dimer", "formic_dimer_de"),
    ):
        if key not in fx.TARGETS:
            continue
        c = cases[name]
        bound = float(gfnff_energy(c["x"], c["top"], p))
        free = float(gfnff_energy(c["sep"], c["top"], p))
        rec(key, free - bound)

    # ---- relaxed geometries ----
    def relax(zx, charge=0):
        z, x = zx
        calc = GFNFF(z, x, charge=charge)
        res = optimize_batch(calc, jnp.asarray(x)[None], fmax=0.02, max_steps=4000)
        return np.asarray(res.coords[0])

    def relax_charged_e(z, x, charge, site, tgt):
        calc = GFNFF(np.asarray(z), np.asarray(x), charge=charge,
                     charge_site=site, site_charge_target=tgt)
        res = optimize_batch(calc, jnp.asarray(x)[None], fmax=0.02,
                             max_steps=4000)
        return float(res.energy[0])

    xw = relax(fx.water())
    rec("water_oh", np.linalg.norm(xw[1] - xw[0]))
    rec("water_hoh", _angle(xw, 1, 0, 2))
    xe = relax(fx.ethane())
    rec("ethane_cc", np.linalg.norm(xe[1] - xe[0]))
    rec("ethane_ch", np.linalg.norm(xe[2] - xe[0]))
    xv = relax(fx.ethylene())
    rec("ethylene_cc", np.linalg.norm(xv[1] - xv[0]))
    xf = relax(fx.formaldehyde())
    rec("formaldehyde_co", np.linalg.norm(xf[1] - xf[0]))
    xm = relax(fx.methanol())
    rec("methanol_co", np.linalg.norm(xm[1] - xm[0]))
    xa = relax(fx.ammonia())
    rec("ammonia_nh", np.linalg.norm(xa[1] - xa[0]))
    xd = relax(fx.water_dimer())
    rec("water_dimer_oo", np.linalg.norm(xd[3] - xd[0]))
    from firecode_tpu.ops.algebra import dihedral

    xb2 = relax(fx.biphenyl(44.0))
    phi = float(dihedral(jnp.asarray(xb2)[np.array([2, 0, 11, 13])][None])[0])
    rec("biphenyl_twist", min(abs(phi), 180.0 - abs(phi)))
    xbz = relax(fx.benzene())
    rec("benzene_cc", np.linalg.norm(xbz[0] - xbz[2]))

    # second-row hydrides / thioether (S and P beyond the CHNO core)
    xs = relax(fx.h2s())
    rec("h2s_sh", np.linalg.norm(xs[1] - xs[0]))
    rec("h2s_hsh", _angle(xs, 1, 0, 2))
    xt = relax(fx.methanethiol())
    rec("ch3sh_cs", np.linalg.norm(xt[1] - xt[0]))
    xds = relax(fx.dimethyl_sulfide())
    rec("dms_csc", _angle(xds, 1, 0, 2))
    xp = relax(fx.phosphine())
    rec("ph3_ph", np.linalg.norm(xp[1] - xp[0]))
    rec("ph3_hph", _angle(xp, 1, 0, 2))

    # sp carbon: alkyne/nitrile triple bonds and the CONTRACTED sigma
    # bonds next to them (s-character: alkyne C-H, propyne/acetonitrile
    # sp3-sp single bonds)
    xac = relax(fx.acetylene())
    rec("acetylene_cc", np.linalg.norm(xac[1] - xac[0]))
    rec("acetylene_ch", np.linalg.norm(xac[2] - xac[0]))
    xhc = relax(fx.hydrogen_cyanide())
    rec("hcn_cn", np.linalg.norm(xhc[1] - xhc[0]))
    xpy = relax(fx.propyne())
    rec("propyne_cc_single", np.linalg.norm(xpy[1] - xpy[0]))
    xan = relax(fx.acetonitrile())
    rec("acetonitrile_cc", np.linalg.norm(xan[1] - xan[0]))

    # saturated ring: chair geometry + the twist-boat local minimum. Both
    # starts are descent basins (fixtures build each pucker mode), so the
    # relaxed twist-boat staying twist-boat is itself part of the test —
    # if it collapsed to the chair the gap would read ~0 and fail.
    xch = relax(fx.cyclohexane("chair"))
    rec("cyclohexane_cc", float(np.mean(
        [np.linalg.norm(xch[k] - xch[(k + 1) % 6]) for k in range(6)]
    )))
    rec("cyclohexane_ccc", float(np.mean(
        [_angle(xch, (k - 1) % 6, k, (k + 1) % 6) for k in range(6)]
    )))
    xtb_ring = relax(fx.cyclohexane("twist_boat"))
    ring_calc = GFNFF(*fx.cyclohexane("chair"))
    rec("cyclohexane_twist_boat",
        float(ring_calc.energy(jnp.asarray(xtb_ring)))
        - float(ring_calc.energy(jnp.asarray(xch))))

    # chair -> chair ring-flip barrier through the half-chair TS: the
    # full TS stack end-to-end — CI-NEB chair -> twist-boat, then EF
    # saddle refinement on exact autodiff Hessians (exp dH-ddagger 10.8,
    # NMR line-shape; the saddle carries exactly one imaginary mode,
    # ~ -230 cm-1, matching DFT half-chair values — asserted in
    # tests/test_accuracy.py)
    from firecode_tpu.opt.neb import run_neb
    from firecode_tpu.opt.saddle import saddle_refine

    neb_ring = run_neb(ring_calc, xch, xtb_ring, n_images=9)
    sad_ring = saddle_refine(ring_calc, neb_ring.ts_coords, fmax=5e-4,
                             max_steps=400)
    rec("cyclohexane_ringflip_barrier",
        sad_ring.energy - float(ring_calc.energy(jnp.asarray(xch))))

    # ester + secondary amine (round-4 fixture extension)
    xmf = relax(fx.methyl_formate())
    rec("ester_co_double", np.linalg.norm(xmf[1] - xmf[0]))
    rec("ester_co_single_mean", 0.5 * (
        np.linalg.norm(xmf[2] - xmf[0]) + np.linalg.norm(xmf[4] - xmf[2])
    ))
    xdma = relax(fx.dimethylamine())
    rec("dma_cn", np.linalg.norm(xdma[1] - xdma[0]))
    rec("dma_cnc", _angle(xdma, 1, 0, 2))

    # charged hydrogen bonds (CAHB term, params.khb_qd/khb_qa): both
    # complexes were UNBOUND before the charge-assisted boost
    def chb_de(zx, charge, site, tgt, sep_from):
        z_c, x_c = zx
        e_cplx = relax_charged_e(z_c, x_c, charge, site, tgt)
        x_sep = np.asarray(x_c).copy()
        x_sep[sep_from:] += np.array([40.0, 0.0, 0.0])
        e_sep = relax_charged_e(z_c, x_sep, charge, site, tgt)
        return e_sep - e_cplx

    rec("chb_nh4_water_de",
        chb_de(fx.ammonium_water(), 1, [0, 1, 2, 3, 4], 1.0, 5))
    rec("chb_hydroxide_water_de",
        chb_de(fx.hydroxide_water(), -1, [0, 1], -1.0, 2))

    # heteroaromatics: pyridine (aromatic N), furan / thiophene
    # (conjugated divalent O/S perceived SP2; bond alternation)
    xpyr = relax(fx.pyridine())
    rec("pyridine_cn", np.linalg.norm(xpyr[0] - xpyr[1]))
    rec("pyridine_cnc", _angle(xpyr, 1, 0, 5))
    xfu = relax(fx.furan())
    rec("furan_co", np.linalg.norm(xfu[0] - xfu[1]))
    rec("furan_c2c3", np.linalg.norm(xfu[1] - xfu[2]))
    rec("furan_c3c4", np.linalg.norm(xfu[2] - xfu[3]))
    xth = relax(fx.thiophene())
    rec("thiophene_sc", np.linalg.norm(xth[0] - xth[1]))
    rec("thiophene_csc", _angle(xth, 1, 0, 4))

    # halogens: C-X in the methyl halides, H-X in the hydrogen halides
    for zx, sym in ((9, "f"), (17, "cl"), (35, "br"), (53, "i")):
        xh = relax(fx.methyl_halide(zx))
        rec(f"ch3{sym}_c{sym}", np.linalg.norm(xh[1] - xh[0]))
        xd2 = relax(fx.hydrogen_halide(zx))
        rec(f"h{sym}_h{sym}", np.linalg.norm(xd2[1] - xd2[0]))

    # methanol hydroxyl rotor: rigid 60-degree rotation from the staggered
    # reference (the substitution-scaled sp3 barrier — 3 quads vs ethane's 9)
    from firecode_tpu.ops.torsion_ops import rotate_dihedral

    zm, xm0 = fx.methanol()
    mcalc = GFNFF(zm, xm0)
    mmask = np.zeros(len(zm), bool)
    mmask[2] = True  # the O-H hydrogen
    mframes = rotate_dihedral(
        jnp.broadcast_to(jnp.asarray(xm0), (2, len(zm), 3)),
        jnp.asarray(np.array([3, 0, 1, 2], np.int32)),
        jnp.asarray([0.0, 60.0]),
        jnp.asarray(mmask),
    )
    em = [float(mcalc.energy(mframes[i])) for i in range(2)]
    rec("methanol_oh_torsion", em[1] - em[0])

    # NH3 inversion: relaxed pyramidal minimum vs rigid planarized geometry
    # at the same N-H length
    za, _ = fx.ammonia()
    acalc = GFNFF(*fx.ammonia())
    xa_min = relax(fx.ammonia())
    e_min = float(acalc.energy(jnp.asarray(xa_min)))
    rnh = float(np.mean([np.linalg.norm(xa_min[i] - xa_min[0]) for i in (1, 2, 3)]))
    xa_flat = np.zeros_like(xa_min)
    for i, ang in zip((1, 2, 3), (0.0, 2 * np.pi / 3, 4 * np.pi / 3)):
        xa_flat[i] = [rnh * np.cos(ang), rnh * np.sin(ang), 0.0]
    rec("nh3_inversion", float(acalc.energy(jnp.asarray(xa_flat))) - e_min)

    # ---- gas-phase ion energetics (pKa-workflow credibility) ----
    # deprotonation/protonation class deltas with the SITE-CONSTRAINED EEQ
    # (GFNFFTopology.site_b + fitted params.K_CT) — pass/fail ANCHORS since
    # round 4 (they were diagnostics with 12-50 kcal/mol errors under free
    # atom-space EEQ; the constraint lands each within ~3 kcal/mol).
    ions = ion_class_deltas()
    for key in (
        "ddep_water_minus_methanol", "ddep_methanol_minus_ethanol",
        "ddep_acetic_minus_formic", "dpa_methylamine_minus_ammonia",
        "ddep_methanol_minus_formic",
    ):
        rec(key, ions[key])
    report["ion_orderings"] = {
        "acidity_ordering_ok": ions["acidity_ordering_ok"],
        "pa_ordering_ok": ions["pa_ordering_ok"],
    }

    # ---- harmonic frequencies (exact autodiff Hessians) ----
    from firecode_tpu.opt.hessian import (
        batch_hessian,
        cleanup_frequencies,
        mass_weighted_frequencies,
    )

    def vib_modes(zx):
        z, x = zx
        calc = GFNFF(z, x)
        res = optimize_batch(calc, jnp.asarray(x)[None], fmax=5e-4,
                             max_steps=8000)
        h = batch_hessian(calc, res.coords)
        f_all, _ = mass_weighted_frequencies(np.asarray(h[0]), z)
        xr = np.asarray(res.coords[0])
        vib, _ = cleanup_frequencies(f_all, xr)
        return np.sort(np.asarray(vib)), xr

    vw, xw = vib_modes(fx.water())
    rec("freq_water_bend", vw[0])
    rec("freq_water_stretch", vw[-1])
    from firecode_tpu.thermo import zero_point_energy

    rec("zpe_water", zero_point_energy(vw))
    vme, xme = vib_modes(fx.methane())
    rec("freq_methane_ch", vme[-1])
    vet, xet = vib_modes(fx.ethane())
    rec("freq_ethane_torsion", vet[0])
    rec("freq_ethylene_ch", vib_modes(fx.ethylene())[0][-1])
    vh, _ = vib_modes(fx.hydrogen_cyanide())
    rec("freq_hcn_cn", vh[-2])
    rec("freq_hcn_ch", vh[-1])

    # ---- standard molar entropies (NIST ideal gas, 1 atm, 298.15 K) ----
    # the full thermo stack end-to-end: GFN-FF minimum -> autodiff Hessian
    # -> qRRHO S_vib + S_trans(P=1 atm) + S_rot(sigma); cal/mol/K
    from firecode_tpu.thermo import rrho_thermo

    def s298(vib, coords, z, sigma):
        th = rrho_thermo(vib, coords, z, P=1.0, sigma=sigma)
        return (th["s_vib"] + th["s_trans"] + th["s_rot"]) * 1000.0

    van, xan = vib_modes(fx.ammonia())
    rec("s298_water", s298(vw, xw, fx.water()[0], sigma=2))
    rec("s298_ammonia", s298(van, xan, fx.ammonia()[0], sigma=3))
    rec("s298_methane", s298(vme, xme, fx.methane()[0], sigma=12))
    rec("s298_ethane", s298(vet, xet, fx.ethane()[0], sigma=6))

    # ---- hydration free energies (GB+SASA, committed anchored fit) ----
    from firecode_tpu.calculators.fit_solvation import (
        alpb_mad_by_solvent,
        hydration_energies,
    )
    from firecode_tpu.calculators.solvation import load_solv_params

    hyd = hydration_energies(load_solv_params())
    for name, e in hyd.items():
        tgt, tol = fx.HYDRATION_TARGETS[name]
        key = f"dg_hyd_{name}"
        report["targets"][key] = {
            "value": round(e, 2), "target": tgt, "tol": tol,
            "ok": bool(abs(e - tgt) <= tol),
        }

    # ion hydration anchors (KCT-2006): the charge-dependent Born
    # corrections (solvation.DEFAULT_ION_PARAMS, committed ion fit) —
    # these set the aqueous pKa deltas of the native tier
    from firecode_tpu.calculators.fit_solvation import ion_hydration_energies
    from firecode_tpu.calculators.solvation import load_ion_params

    for name, e in ion_hydration_energies(load_ion_params()).items():
        tgt, tol = fx.ION_HYDRATION_TARGETS[name]
        key = f"dg_hyd_{name}"
        report["targets"][key] = {
            "value": round(e, 2), "target": tgt, "tol": tol,
            "ok": bool(abs(e - tgt) <= tol),
        }
    mad = alpb_mad_by_solvent()
    if mad:
        report["alpb_mad_by_solvent"] = mad  # gated: only with the xtb binary

    n_ok = sum(1 for t in report["targets"].values() if t["ok"])
    report["n_targets"] = len(report["targets"])
    report["n_within_tolerance"] = n_ok
    return report


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true")
    args = ap.parse_args()

    report = compute_report()
    for name, t in report["targets"].items():
        mark = "ok " if t["ok"] else "FAIL"
        print(
            f"  [{mark}] {name:22s} {t['value']:9.3f}  "
            f"(target {t['target']} +- {t['tol']})"
        )
    print(f"  {report['n_within_tolerance']}/{report['n_targets']} within tolerance")
    if args.write:
        path = os.path.join(os.path.dirname(__file__), "..", "..", "..", "ACCURACY.json")
        path = os.path.abspath(path)
        with open(path, "w") as fh:
            json.dump(report, fh, indent=1)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
