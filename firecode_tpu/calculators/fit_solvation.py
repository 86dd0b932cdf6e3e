"""Anchor the native GB+SASA solvation model (VERDICT r2 item 9).

Primary anchor (always available): experimental hydration free energies of
the embedded fixture molecules (fixtures.HYDRATION_TARGETS). Secondary,
gated anchor: when the real `xtb` binary is installed, ALPB delta-solvation
energies are collected for every solvent in firecode_tpu.solvents and the
per-solvent MAD vs ALPB is recorded alongside.

The fit moves four physical scalars (surface tension, Born-radius scale,
HCT descreening, polar scale) by gradient descent — the solvation energy is
pure JAX and differentiable in them. Results go to
calculators/data/solvation_fit.npz (loaded by solvation.load_solv_params)
and the per-molecule errors into ACCURACY.json via gfnff.accuracy.

Run:  python -m firecode_tpu.calculators.fit_solvation [--steps 400] [--write]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from firecode_tpu.calculators.gfnff import fixtures as fx
from firecode_tpu.calculators.solvation import DEFAULT_SOLV_PARAMS

_FIXTURES = {
    "water": fx.water,
    "methanol": fx.methanol,
    "ammonia": fx.ammonia,
    "methane": fx.methane,
    "ethane": fx.ethane,
    "butane": fx.butane,
    "formaldehyde": fx.formaldehyde,
    "formic_acid": fx.formic_acid,
}


def _cases():
    import jax.numpy as jnp

    out = {}
    for name in fx.HYDRATION_TARGETS:
        z, x = _FIXTURES[name]()
        out[name] = (np.asarray(z), jnp.asarray(x))
    return out


def hydration_energies(params: dict) -> dict:
    """dG_hyd per fixture molecule with the given model parameters."""
    from firecode_tpu.calculators.solvation import solvation_energy_fn

    out = {}
    for name, (z, x) in _cases().items():
        fn = solvation_energy_fn(z, "water", params=params)
        out[name] = float(fn(x))
    return out


def run_fit(steps: int = 400, lr: float = 0.05, verbose: bool = True) -> dict:
    import jax
    import jax.numpy as jnp
    import optax

    from firecode_tpu.calculators.solvation import solvation_energy_fn

    cases = _cases()
    keys = ("gamma", "rho_scale", "hct", "polar_scale", "rho_H", "rho_C", "rho_N", "rho_O")
    theta = jnp.asarray([np.log(DEFAULT_SOLV_PARAMS[k]) for k in keys])

    def loss(theta):
        p = {k: jnp.exp(theta[i]) for i, k in enumerate(keys)}
        total = 0.0
        for name, (z, x) in cases.items():
            tgt, tol = fx.HYDRATION_TARGETS[name]
            fn = solvation_energy_fn(z, "water", params=p)
            total = total + ((fn(x) - tgt) / tol) ** 2
        # keep the parameters physical
        theta0 = jnp.asarray([np.log(DEFAULT_SOLV_PARAMS[k]) for k in keys])
        reg = jnp.asarray([0.1, 0.1, 0.1, 0.1, 2.0, 2.0, 2.0, 2.0])
        return total + jnp.sum(reg * (theta - theta0) ** 2)

    opt = optax.adam(lr)
    state = opt.init(theta)
    vg = jax.jit(jax.value_and_grad(loss))
    for step in range(steps):
        val, g = vg(theta)
        upd, state = opt.update(g, state)
        theta = optax.apply_updates(theta, upd)
        if verbose and (step % 100 == 0 or step == steps - 1):
            print(f"  step {step:4d}  loss {float(val):9.3f}")
    return {k: float(np.exp(theta[i])) for i, k in enumerate(keys)}


def ion_cases():
    """Relaxed ion geometries + (charge, site, target) for the ion anchors.

    Built from the neutral fixtures via deprotonate/protonate with the
    site-constrained GFNFF relax — the same conventions as
    gfnff.accuracy.ion_class_deltas, so the solvation calibration sees
    exactly the geometries/charges the pKa workflow produces."""
    import jax.numpy as jnp

    from firecode_tpu.calculators.gfnff import GFNFF
    from firecode_tpu.driver.pka import deprotonate, protonate
    from firecode_tpu.graphs import graphize
    from firecode_tpu.opt.fire import optimize_batch

    def relax(z, x, charge=0, site=None, target=None):
        calc = GFNFF(np.asarray(z), np.asarray(x), charge=charge,
                     charge_site=site, site_charge_target=target)
        res = optimize_batch(calc, jnp.asarray(x)[None], fmax=0.05,
                             max_steps=2000)
        return np.asarray(res.coords[0])

    def dep(zx, h):
        z, x = np.asarray(zx[0]), np.asarray(zx[1])
        x0 = relax(z, x)
        q0 = GFNFF(z, x0).charges(x0)
        g = graphize(z, x0)
        heavy = next(j for j in g.neighbors(h) if z[j] != 1)
        za, xa = deprotonate(z, x0, h)
        hn = heavy - (1 if h < heavy else 0)
        tgt = float(q0[heavy] + q0[h] - 1.0)
        return za, relax(za, xa, -1, site=[hn], target=tgt), -1, [hn], tgt

    def prot(zx, heavy):
        z, x = np.asarray(zx[0]), np.asarray(zx[1])
        x0 = relax(z, x)
        q0 = GFNFF(z, x0).charges(x0)
        zp, xp = protonate(z, x0, heavy)
        site = [heavy, len(zp) - 1]
        tgt = float(q0[heavy] + 1.0)
        return zp, relax(zp, xp, +1, site=site, target=tgt), +1, site, tgt

    return {
        "hydroxide": dep(fx.water(), 1),
        "methoxide": dep(fx.methanol(), 2),
        "formate": dep(fx.formic_acid(), 4),
        "acetate": dep(fx.acetic_acid(), 3),
        "ammonium": prot(fx.ammonia(), 0),
        "methylammonium": prot(fx.methylamine(), 1),
    }


def ion_hydration_energies(p_ion: dict, cases=None) -> dict:
    """dG_hyd per ion with the given ion-correction parameters."""
    import jax.numpy as jnp

    from firecode_tpu.calculators.solvation import (
        load_solv_params,
        solvation_energy_fn,
    )

    cases = cases or ion_cases()
    merged = {**load_solv_params(), **p_ion}
    out = {}
    for name, (z, x, charge, site, tgt) in cases.items():
        fn = solvation_energy_fn(
            z, "water", total_charge=charge, params=merged,
            charge_site=site, site_charge_target=tgt,
        )
        out[name] = float(fn(jnp.asarray(x)))
    return out


def run_ion_fit(steps: int = 400, lr: float = 0.02, verbose: bool = True) -> dict:
    """Fit the sign-split ion Born corrections (k_qr_an/hct_an,
    k_qr_cat/hct_cat) against fixtures.ION_HYDRATION_TARGETS; the neutral
    fit is untouched. Raw-space adam (k_qr_cat may legitimately be
    negative — radius expansion); hct through a sigmoid onto (0, 1.2)."""
    import jax
    import jax.numpy as jnp
    import optax

    from firecode_tpu.calculators.solvation import (
        DEFAULT_ION_PARAMS,
        load_solv_params,
        solvation_energy_fn,
    )

    cases = ion_cases()
    base = load_solv_params()

    def logit(h):
        h = min(max(h / 1.2, 1e-3), 1 - 1e-3)
        return float(np.log(h / (1 - h)))

    theta = jnp.asarray([
        DEFAULT_ION_PARAMS["k_qr_an"], logit(DEFAULT_ION_PARAMS["hct_an"]),
        DEFAULT_ION_PARAMS["k_qr_cat"], logit(DEFAULT_ION_PARAMS["hct_cat"]),
        logit(min(DEFAULT_ION_PARAMS["hct_alkyl_scale"], 1.19)),
    ])

    def unpack(theta):
        return {
            "k_qr_an": theta[0], "hct_an": 1.2 * jax.nn.sigmoid(theta[1]),
            "k_qr_cat": theta[2], "hct_cat": 1.2 * jax.nn.sigmoid(theta[3]),
            "hct_alkyl_scale": 1.2 * jax.nn.sigmoid(theta[4]),
        }

    def loss(theta):
        p = dict(base)
        p.update(unpack(theta))
        total = 0.0
        for name, (z, x, charge, site, tgt_c) in cases.items():
            tgt, tol = fx.ION_HYDRATION_TARGETS[name]
            fn = solvation_energy_fn(
                z, "water", total_charge=charge, params=p,
                charge_site=site, site_charge_target=tgt_c,
            )
            total = total + ((fn(jnp.asarray(x)) - tgt) / tol) ** 2
        return total

    opt = optax.adam(lr)
    state = opt.init(theta)
    vg = jax.jit(jax.value_and_grad(loss))
    for step in range(steps):
        val, g = vg(theta)
        upd, state = opt.update(g, state)
        theta = optax.apply_updates(theta, upd)
        if verbose and (step % 50 == 0 or step == steps - 1):
            print(f"  ion step {step:4d}  loss {float(val):9.3f}", flush=True)
    out = unpack(theta)
    return {k: float(v) for k, v in out.items()}


def write_ion_fit(params: dict) -> str:
    path = os.path.join(
        os.path.dirname(__file__), "data", "solvation_ion_fit.npz"
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez(path, **{k: np.float64(v) for k, v in params.items()})
    return path


def alpb_mad_by_solvent() -> dict:
    """Gated: per-solvent MAD vs the xtb binary's ALPB delta-solvation."""
    from firecode_tpu.calculators.dispatcher import xtb_available

    if not xtb_available():
        return {}
    from firecode_tpu.calculators.solvation import solvation_energy_fn
    from firecode_tpu.calculators.xtb_io import xtb_energy_and_gradient
    from firecode_tpu.solvents import get_xtb_solvent_name, xtb_solvent_names

    out = {}
    cases = _cases()
    for solvent in xtb_solvent_names:
        xtb_name = get_xtb_solvent_name(solvent)  # xtb's own ALPB spelling
        errs = []
        for name, (z, x) in cases.items():
            try:
                e_gas, _ = xtb_energy_and_gradient(z, np.asarray(x))
                e_sol, _ = xtb_energy_and_gradient(z, np.asarray(x), solvent=xtb_name)
            except Exception:
                continue
            native = float(solvation_energy_fn(z, solvent)(x))
            errs.append(abs(native - (e_sol - e_gas)))
        if errs:
            out[solvent] = round(float(np.mean(errs)), 2)
    return out


def write_fit(params: dict) -> str:
    path = os.path.join(os.path.dirname(__file__), "data", "solvation_fit.npz")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez(path, **{k: np.float64(v) for k, v in params.items()})
    return path


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--write", action="store_true")
    ap.add_argument("--ions", action="store_true",
                    help="fit only the ion corrections (k_qr, hct_ion)")
    args = ap.parse_args()

    if args.ions:
        print("anchoring ion Born corrections against KCT-2006 ion dG_hyd ...")
        fitted = run_ion_fit(steps=args.steps)
        print("\nfitted:", {k: round(v, 4) for k, v in fitted.items()})
        es = ion_hydration_energies(fitted)
        for name, e in es.items():
            tgt, tol = fx.ION_HYDRATION_TARGETS[name]
            mark = "ok " if abs(e - tgt) <= tol else "FAIL"
            print(f"  [{mark}] {name:14s} {e:8.2f}  ({tgt} +- {tol})")
        if args.write:
            print("wrote", write_ion_fit(fitted))
        return

    print("anchoring GB+SASA against experimental hydration energies ...")
    fitted = run_fit(steps=args.steps)
    print("\nfitted:", {k: round(v, 4) for k, v in fitted.items()})
    print("\nper-molecule dG_hyd (target):")
    es = hydration_energies(fitted)
    for name, e in es.items():
        tgt, tol = fx.HYDRATION_TARGETS[name]
        mark = "ok " if abs(e - tgt) <= tol else "FAIL"
        print(f"  [{mark}] {name:14s} {e:7.2f}  ({tgt} +- {tol})")
    mad = alpb_mad_by_solvent()
    if mad:
        print("\nper-solvent MAD vs ALPB:", mad)
    if args.write:
        print("wrote", write_fit(fitted))


if __name__ == "__main__":
    main()
