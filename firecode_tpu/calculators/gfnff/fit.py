"""In-repo fit of the GFN-FF global scalars against literature fixtures.

The energy (energy.py) is differentiable in its global parameters, so the
fit is plain gradient descent on a composite loss:

- force matching: |grad E|^2 at experimental equilibrium geometries
  (water, ammonia, methane, ethane, ethylene, formaldehyde, methanol,
  butane, water dimer, formic acid + cyclic dimer) — pulls the PES minima
  onto the measured structures, including the H-bond contacts;
- torsion energetics: ethane barrier, butane gauche/TS/syn ladder,
  ethylene pi twist (rigid scans from the reference geometries);
- dimer binding energies: water dimer and formic acid dimer De against
  separated geometries evaluated on the SAME topology (size-consistent by
  construction).

Positive parameters are optimized in log space with a soft pull toward
their physics-anchored defaults, so the result stays interpretable.

Run:  python -m firecode_tpu.calculators.gfnff.fit [--steps 600] [--write]
--write stores the result in data/gfnff_fit.npz (committed; loaded by
params.load_fitted) and prints the fixture report that accuracy.py turns
into ACCURACY.json.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from firecode_tpu.calculators.gfnff import fixtures as fx
from firecode_tpu.calculators.gfnff.params import GlobalParams

# parameters the fit may move (everything else stays at its default).
# Stiffness scalars (kb_a, ka_s, koop, khb_w) are deliberately
# EXCLUDED: pure force matching at minima rewards softening every spring
# (|F| shrinks with k at fixed displacement), so they stay at their
# physics-anchored defaults and only geometry-positioning and interaction
# strengths are trained.
# s6 is frozen at 1.0 (the D3(BJ) convention) so London dispersion keeps
# its physical long-range strength; a1/a2 carry strong regularization for
# the same reason.
FIT_KEYS = (
    "ken", "kr_pi", "kt_sp3", "kt_pi", "kt_conj", "krep", "krep_13",
    "krep_hb", "s8", "a1", "a2", "khb", "khb_sp2", "kt_bo_exp", "kr_sp",
)
_REG = 0.05  # pull toward the defaults (log space)
# krep is pinned HARD: the torsion constants (kt_sp3 free) absorb whatever
# barrier share the Pauli wall does not cover, so the fit must not be
# allowed to trade the wall away against scan targets (that broke butane
# gauche and biaryl sterics in earlier rounds)
# a1/a2 pinned hard too: a small BJ radius turns dispersion into a BOND
# compressor (at R0 ~ 1.8 the -C6/r^6 gradient at 1.5 A is ~10 kcal/mol/A,
# which dragged every C-C 0.05 A short); physical R0 ~ 3+ A keeps the
# dimer wells while staying flat at bonded range
_REG_PER_KEY = {"a1": 4.0, "a2": 4.0, "krep": 4.0, "krep_13": 0.3}
_WF = 0.006  # force-matching weight (kcal/mol/A)^-2


def _build_cases():
    """Topologies + geometry stacks, all params-independent."""
    import jax.numpy as jnp

    from firecode_tpu.calculators.gfnff.topology import build_gfnff_topology
    from firecode_tpu.ops.torsion_ops import rotate_dihedral

    cases = {}

    def add(name, zx, charge=0):
        z, x = zx
        cases[name] = {
            "top": build_gfnff_topology(z, x, charge=charge),
            "x": jnp.asarray(x),
        }

    add("water", fx.water())
    add("ammonia", fx.ammonia())
    add("methane", fx.methane())
    add("ethane", fx.ethane())
    add("ethylene", fx.ethylene())
    add("formaldehyde", fx.formaldehyde())
    add("methanol", fx.methanol())
    add("butane", fx.butane())
    add("methane_dimer", fx.methane_dimer())
    add("water_dimer", fx.water_dimer())
    add("formic_acid", fx.formic_acid())
    add("formic_dimer", fx.formic_acid_dimer())
    add("biphenyl", fx.biphenyl(44.0))
    add("formamide", fx.formamide())
    # sp-carbon corpus: triple bonds (pi contraction) + the contracted
    # sigma bonds next to them (kr_sp, gated by 1-BO). The generic
    # force-matching and bond-length-anchoring residuals cover them.
    add("acetylene", fx.acetylene())
    add("hcn", fx.hydrogen_cyanide())
    add("propyne", fx.propyne())
    add("acetonitrile", fx.acetonitrile())

    def scan(base, quad, mask_idx, angles, n_atoms):
        mask = np.zeros(n_atoms, bool)
        mask[mask_idx] = True
        return rotate_dihedral(
            jnp.broadcast_to(jnp.asarray(base), (len(angles), n_atoms, 3)),
            jnp.asarray(np.asarray(quad, np.int32)),
            jnp.asarray(np.asarray(angles, float)),
            jnp.asarray(mask),
        )

    # rigid torsion scans from the reference geometries
    _, xe = fx.ethane()
    cases["ethane"]["scan"] = scan(xe, [2, 0, 1, 5], [5, 6, 7], [0.0, 60.0], 8)
    _, xv = fx.ethylene()
    cases["ethylene"]["scan"] = scan(xv, [2, 0, 1, 4], [4, 5], [0.0, 90.0], 6)
    _, xb = fx.butane()
    moving = [3, 7, 8, 9, 12, 13]
    cases["butane"]["scan"] = scan(
        xb, [0, 1, 2, 3], moving, [0.0, 60.0, 120.0, 180.0], 14
    )
    # biphenyl inter-ring twist ladder: the generator reproduces the same
    # atom order at any twist, so the 44-degree topology serves all frames.
    # Anchors the conjugation/sterics/dispersion balance no small-molecule
    # fixture constrains: near-planar minima mean bonded-range dispersion
    # (BJ radius too small) or kt_conj is overpowering the ortho-H wall.
    cases["biphenyl"]["scan"] = jnp.asarray(
        np.stack([fx.biphenyl(t)[1] for t in (0.0, 44.0, 90.0)])
    )

    # amide C-N rotation: rigid 90-degree twist of the NH2 hydrogens
    _, xf = fx.formamide()
    cases["formamide"]["scan"] = scan(xf, [1, 0, 2, 4], [4, 5], [0.0, 90.0], 6)

    # separated dimers (same topology -> size-consistent De)
    for name, first in (("methane_dimer", 5), ("water_dimer", 3), ("formic_dimer", 5)):
        xs = np.asarray(cases[name]["x"]).copy()
        xs[first:] += np.array([50.0, 0.0, 0.0])
        cases[name]["sep"] = jnp.asarray(xs)

    # radial ladders: rigid translations of the second monomer along the
    # intermolecular axis. These anchor the repulsive wall + well shape —
    # force matching at minima alone lets the fit collapse the repulsion
    # (the r2 diagnosis: water dimer relaxing to O...O 2.1 A).
    def ladder(name, first, deltas):
        x0 = np.asarray(cases[name]["x"])
        stack = []
        for dr in deltas:
            xs = x0.copy()
            xs[first:] += np.array([dr, 0.0, 0.0])
            stack.append(xs)
        cases[name]["ladder"] = jnp.asarray(np.stack(stack))

    # water dimer O...O: 2.91 (ref) -> 2.61 / 2.71 / 3.41
    ladder("water_dimer", 3, [-0.30, -0.20, 0.50])
    cases["water_dimer"]["ladder_de"] = (1.8, 1.0, 1.2)  # E(r) - E(ref)
    # methane dimer C...C: 3.63 -> 3.13 / 3.33 / 4.23
    ladder("methane_dimer", 5, [-0.50, -0.30, 0.60])
    cases["methane_dimer"]["ladder_de"] = (1.3, 0.35, 0.25)
    return cases


def _loss_fn(cases):
    import jax
    import jax.numpy as jnp

    from firecode_tpu.calculators.gfnff.energy import gfnff_energy

    defaults = GlobalParams().asdict()

    def with_params(theta):
        p = dict(defaults)
        for i, k in enumerate(FIT_KEYS):
            p[k] = jnp.exp(theta["scalars"][i])
        p["bond_radii"] = jnp.exp(theta["log_radii"])
        return p

    def loss(theta):
        p = with_params(theta)
        total = 0.0
        # force matching
        for name, c in cases.items():
            g = jax.grad(gfnff_energy)(c["x"], c["top"], p)
            total = total + _WF * jnp.mean(jnp.sum(g * g, axis=-1))

        # direct bond-length anchoring: the model equilibrium r0 of every
        # fixture bond must sit on the measured distance. This attributes
        # geometry error to the radii/ken/kr_pi DIRECTLY — force matching
        # alone let the fit trade C-C length for unrelated torsion targets.
        from firecode_tpu.calculators.gfnff.energy import bond_params

        for name, c in cases.items():
            top = c["top"]
            if top.bonds.shape[0] == 0:
                continue
            r0_model, _, _ = bond_params(top, p)
            d = c["x"][top.bonds[:, 0]] - c["x"][top.bonds[:, 1]]
            r_exp = jnp.sqrt(jnp.sum(d * d, axis=-1))
            total = total + jnp.sum(((r0_model - r_exp) / 0.02) ** 2)

        def e_of(name, x):
            return gfnff_energy(x, cases[name]["top"], p)

        def scan_e(name):
            c = cases[name]
            return jax.vmap(lambda x: gfnff_energy(x, c["top"], p))(c["scan"])

        # ethane barrier (eclipsed - staggered)
        ee = scan_e("ethane")
        total = total + ((ee[1] - ee[0] - 2.9) / 0.4) ** 2
        # ethylene pi twist
        ev = scan_e("ethylene")
        total = total + ((ev[1] - ev[0] - 65.0) / 8.0) ** 2
        # butane ladder: anti(0) / TS(60 -> dihedral 120) / gauche(120) / syn(180)
        eb = scan_e("butane")
        total = total + ((eb[2] - eb[0] - 0.9) / 0.8) ** 2  # gauche (rigid ~ +0.15)
        total = total + ((eb[1] - eb[0] - 3.6) / 0.8) ** 2  # anti->gauche TS
        total = total + ((eb[3] - eb[0] - 6.0) / 1.5) ** 2  # syn (rigid upper)
        # amide rotation: rigid proxy a few kcal over the relaxed exp 16-18
        ef = scan_e("formamide")
        total = total + ((ef[1] - ef[0] - 20.0) / 2.5) ** 2
        # biphenyl twist profile: twisted (44) minimum with ~2 kcal/mol
        # rigid walls both ways (exp planar barrier 2.0, perp 2.2)
        ebi = scan_e("biphenyl")
        total = total + ((ebi[0] - ebi[1] - 2.0) / 0.7) ** 2
        total = total + ((ebi[2] - ebi[1] - 2.2) / 0.7) ** 2
        # dimer De
        for name, de, tol in (
            ("methane_dimer", 0.53, 0.15),
            ("water_dimer", 5.0, 0.5),
            ("formic_dimer", 18.6, 1.5),
        ):
            c = cases[name]
            bound = gfnff_energy(c["x"], c["top"], p)
            free = gfnff_energy(c["sep"], c["top"], p)
            total = total + ((free - bound - de) / tol) ** 2
            if "ladder" in c:
                el = jax.vmap(lambda x: gfnff_energy(x, c["top"], p))(c["ladder"])
                for i, d_tgt in enumerate(c["ladder_de"]):
                    total = total + ((el[i] - bound - d_tgt) / 0.35) ** 2
        # regularization toward defaults; the radii table is pulled hard
        # (a 5% radius change costs ~0.6) so only bond-force residuals with
        # real signal move it
        theta0 = jnp.asarray([np.log(defaults[k]) for k in FIT_KEYS])
        reg_w = jnp.asarray([_REG_PER_KEY.get(k, _REG) for k in FIT_KEYS])
        total = total + jnp.sum(reg_w * (theta["scalars"] - theta0) ** 2)
        log_r0 = jnp.log(jnp.asarray(np.maximum(defaults["bond_radii"], 1e-3)))
        total = total + 250.0 * jnp.sum((theta["log_radii"] - log_r0) ** 2)
        return total

    return loss


def run_fit(steps: int = 600, lr: float = 0.02, verbose: bool = True) -> GlobalParams:
    import jax
    import jax.numpy as jnp
    import optax

    cases = _build_cases()
    loss = _loss_fn(cases)
    defaults = GlobalParams().asdict()
    theta = {
        "scalars": jnp.asarray([np.log(defaults[k]) for k in FIT_KEYS]),
        "log_radii": jnp.log(
            jnp.asarray(np.maximum(defaults["bond_radii"], 1e-3))
        ),
    }

    opt = optax.adam(lr)
    state = opt.init(theta)
    vg = jax.jit(jax.value_and_grad(loss))

    for step in range(steps):
        val, g = vg(theta)
        upd, state = opt.update(g, state)
        theta = optax.apply_updates(theta, upd)
        if verbose and (step % 100 == 0 or step == steps - 1):
            print(f"  step {step:4d}  loss {float(val):10.3f}")

    fitted = dict(defaults)
    for i, k in enumerate(FIT_KEYS):
        fitted[k] = float(np.exp(theta["scalars"][i]))
    fitted["bond_radii"] = np.asarray(jnp.exp(theta["log_radii"]))
    return GlobalParams.fromdict(fitted)


def write_fit(params: GlobalParams) -> str:
    path = os.path.join(os.path.dirname(__file__), "data", "gfnff_fit.npz")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez(path, **{k: np.float64(v) for k, v in params.asdict().items()})
    return path


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--lr", type=float, default=0.02)
    ap.add_argument("--write", action="store_true")
    args = ap.parse_args()

    print("fitting GFN-FF global scalars against literature fixtures ...")
    fitted = run_fit(steps=args.steps, lr=args.lr)
    print("\nfitted parameters (default -> fitted):")
    d0 = GlobalParams().asdict()
    for k in FIT_KEYS:
        print(f"  {k:10s} {d0[k]:10.4f} -> {fitted.asdict()[k]:10.4f}")
    if args.write:
        path = write_fit(fitted)
        print(f"\nwrote {path}")


if __name__ == "__main__":
    main()
