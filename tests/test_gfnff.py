"""Native GFN-FF calculator: correctness + chemistry + gated xtb parity.

Correctness: autodiff forces vs finite differences, rigid-motion invariance,
size consistency, EEQ charge sanity. Chemistry assertions live in
tests/test_accuracy.py (literature fixtures). The xtb parity test runs only
when the real `xtb` binary is installed (reference test philosophy,
/root/reference/firecode/tests/test_suite.py:53-70).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from firecode_tpu.calculators.gfnff import GFNFF, fixtures as fx


@pytest.fixture(scope="module")
def ethanol_calc():
    from firecode_tpu.sample_molecules import build_ethanol

    z, x = build_ethanol()
    return z, np.asarray(x, float), GFNFF(z, x)


def test_forces_match_finite_differences(ethanol_calc):
    z, x, calc = ethanol_calc
    e0, f = calc.energy_and_forces(jnp.asarray(x))
    f = np.asarray(f)
    rng = np.random.default_rng(0)
    h = 1e-5
    for _ in range(6):
        i = rng.integers(0, len(z))
        k = rng.integers(0, 3)
        xp = x.copy()
        xp[i, k] += h
        xm = x.copy()
        xm[i, k] -= h
        fd = -(float(calc.energy(jnp.asarray(xp))) - float(calc.energy(jnp.asarray(xm)))) / (2 * h)
        assert abs(fd - f[i, k]) < 1e-3 * max(1.0, abs(fd))


def test_rigid_motion_invariance(ethanol_calc):
    z, x, calc = ethanol_calc
    e0 = float(calc.energy(jnp.asarray(x)))
    # translation
    e_t = float(calc.energy(jnp.asarray(x + np.array([3.0, -2.0, 1.0]))))
    assert abs(e_t - e0) < 1e-8
    # rotation
    th = 0.7
    rot = np.array(
        [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]]
    )
    e_r = float(calc.energy(jnp.asarray(x @ rot.T)))
    assert abs(e_r - e0) < 1e-7


def test_size_consistency_of_dimer_topology():
    z, x = fx.water_dimer()
    calc = GFNFF(z, x)
    xs = x.copy()
    xs[3:] += 80.0
    e_far = float(calc.energy(jnp.asarray(xs)))
    xs2 = x.copy()
    xs2[3:] += 160.0
    e_far2 = float(calc.energy(jnp.asarray(xs2)))
    assert abs(e_far - e_far2) < 1e-5  # no spurious long-range interaction


def test_eeq_charges_sane():
    z, x = fx.water()
    calc = GFNFF(z, x)
    q = calc.charges(x)
    assert abs(q.sum()) < 1e-8
    # polarity direction (magnitudes are a fit compromise: the HB correction
    # carries part of what stronger EEQ charges would)
    assert q[0] < -0.1  # oxygen negative
    assert (q[1:] > 0.04).all()
    # charged species: total charge respected
    calc_ion = GFNFF(np.array([8, 1]), np.array([[0.0, 0, 0], [0.97, 0, 0]]), charge=-1)
    q_ion = calc_ion.charges(np.array([[0.0, 0, 0], [0.97, 0, 0]]))
    assert abs(q_ion.sum() + 1.0) < 1e-8


def test_batched_evaluation_matches_single(ethanol_calc):
    z, x, calc = ethanol_calc
    rng = np.random.default_rng(1)
    batch = x[None] + 0.02 * rng.normal(size=(5, *x.shape))
    e_b, f_b = calc.energy_and_forces(jnp.asarray(batch))
    for i in range(5):
        e_i = float(calc.energy(jnp.asarray(batch[i])))
        assert abs(float(e_b[i]) - e_i) < 1e-8


def test_dispatcher_surface():
    from firecode_tpu.calculators.dispatcher import Dispatcher

    z, x = fx.water()
    calc = Dispatcher("GFNFF").get_batch_calc(z, x)
    assert calc.name == "gfnff"
    e = float(calc.energy(jnp.asarray(x)))
    assert np.isfinite(e)
    solv = Dispatcher("GFNFF").get_batch_calc(z, x, solvent="water")
    assert float(solv.energy(jnp.asarray(x))) != e


def test_eeq_cg_solve_matches_dense_and_differentiates(ethanol_calc):
    """The MXU-friendly CG EEQ solve (lax.custom_linear_solve) is a numeric
    drop-in for a dense solve, and the implicit derivative rules are exact
    through second order: charges, energy gradient, and one Hessian row all
    match the dense-solve path / central finite differences."""
    from firecode_tpu.calculators.gfnff.energy import (
        _eeq_solve,
        _eeq_system,
        eeq_energy_and_charges,
    )

    z, x, calc = ethanol_calc
    top = calc.topology
    eeq_args = (top.chi, top.eta, top.eeq_alpha, top.cnf, top.rcov, top.charge)
    c = jnp.asarray(x)

    # solver level: CG == dense solve to near machine precision (f64)
    a, chi_eff = _eeq_system(c, *eeq_args)
    b = jnp.stack([-chi_eff, jnp.ones_like(chi_eff)], axis=-1)
    x_cg = np.asarray(_eeq_solve(a, b))
    x_dense = np.asarray(jnp.linalg.solve(a, b))
    assert np.abs(x_cg - x_dense).max() < 1e-10 * np.abs(x_dense).max()

    # first derivative through custom_linear_solve vs central differences
    def e_es(cc):
        return eeq_energy_and_charges(cc, *eeq_args)[0]

    g = np.asarray(jax.grad(e_es)(c))
    h = 1e-5
    rng = np.random.default_rng(2)
    for _ in range(4):
        i, k = rng.integers(0, len(z)), rng.integers(0, 3)
        xp, xm = x.copy(), x.copy()
        xp[i, k] += h
        xm[i, k] -= h
        fd = (float(e_es(jnp.asarray(xp))) - float(e_es(jnp.asarray(xm)))) / (2 * h)
        assert abs(fd - g[i, k]) < 1e-6 * max(1.0, abs(fd))

    # second derivative: JVP-of-grad (one Hessian row) vs FD of the gradient
    flat = c.reshape(-1)
    tang = jnp.zeros_like(flat).at[4].set(1.0)

    def gflat(v):
        return jax.grad(e_es)(v.reshape(c.shape)).reshape(-1)

    hrow = np.asarray(jax.jvp(gflat, (flat,), (tang,))[1])
    fp = np.asarray(gflat(flat + h * tang))
    fm = np.asarray(gflat(flat - h * tang))
    hrow_fd = (fp - fm) / (2 * h)
    assert np.abs(hrow - hrow_fd).max() < 1e-5 * max(1.0, np.abs(hrow_fd).max())


def test_pi_bond_perception():
    from firecode_tpu.calculators.gfnff import build_gfnff_topology

    z, x = fx.ethylene()
    top = build_gfnff_topology(z, x)
    bo = np.asarray(top.bond_bo)
    bonds = np.asarray(top.bonds)
    cc = [k for k, (i, j) in enumerate(bonds) if z[i] == 6 and z[j] == 6]
    assert len(cc) == 1 and bo[cc[0]] > 0.7  # the C=C carries pi density
    # and ethane's C-C does not
    z2, x2 = fx.ethane()
    top2 = build_gfnff_topology(z2, x2)
    assert np.asarray(top2.bond_bo).max() < 0.05


def test_sp_carbon_topology_and_contraction():
    """sp centers: triple-bond pi density, linear angles, and the
    (1-BO)-gated s-character contraction of neighboring sigma bonds."""
    from firecode_tpu.calculators.gfnff import build_gfnff_topology
    from firecode_tpu.calculators.gfnff.energy import bond_params
    from firecode_tpu.calculators.gfnff.params import load_fitted

    z, x = fx.propyne()
    top = build_gfnff_topology(z, x)
    bonds = np.asarray(top.bonds)
    bo = np.asarray(top.bond_bo)
    nsp = np.asarray(top.bond_nsp)
    k_triple = next(k for k, (i, j) in enumerate(bonds) if {i, j} == {1, 2})
    k_single = next(k for k, (i, j) in enumerate(bonds) if {i, j} == {0, 1})
    assert bo[k_triple] > 1.3  # C#C
    assert bo[k_single] < 0.05  # sp3-sp sigma (gated by the sp3 side)
    assert nsp[k_triple] == 2.0 and nsp[k_single] == 1.0
    # the sp3-sp single bond r0 is contracted below the sp3-sp3 value
    p = load_fitted().asdict()
    r0, _, _ = bond_params(top, p)
    z2, x2 = fx.ethane()
    r0_eth, _, _ = bond_params(build_gfnff_topology(z2, x2), p)
    k_cc_eth = next(
        k for k, (i, j) in enumerate(np.asarray(build_gfnff_topology(z2, x2).bonds))
        if z2[i] == 6 and z2[j] == 6
    )
    assert float(r0[k_single]) < float(r0_eth[k_cc_eth]) - 0.02
    # angles through the sp carbons are linear
    lin = np.asarray(top.angle_lin)
    angles = np.asarray(top.angles)
    for a, (i, c, j) in enumerate(angles):
        if c in (1, 2):
            assert lin[a] == 1.0


def test_hb_triplets_generated():
    from firecode_tpu.calculators.gfnff import build_gfnff_topology

    z, x = fx.water_dimer()
    top = build_gfnff_topology(z, x)
    assert top.hb.shape[0] >= 2  # at least donor H -> acceptor O pairs


@pytest.mark.skipif(
    not __import__("firecode_tpu.calculators.dispatcher", fromlist=["xtb_available"]).xtb_available(),
    reason="xtb binary not installed",
)
def test_xtb_gfnff_parity():
    """Gated: relative energies + force directions vs `xtb --gfnff` across
    a 10-geometry fixture set (VERDICT r2 item 1 'done' criterion)."""
    from firecode_tpu.calculators.xtb_io import xtb_energy_and_gradient

    rng = np.random.default_rng(2)
    systems = [fx.water_dimer(), fx.ethane(), fx.methanol(), fx.butane()]
    all_dn, all_dx, cosines = [], [], []
    for z, x in systems:
        calc = GFNFF(z, x)
        geoms = [x] + [x + 0.04 * rng.normal(size=x.shape) for _ in range(2)]
        e_n, e_x = [], []
        for g in geoms:
            en, fn = calc.energy_and_forces(jnp.asarray(g))
            ex, fx_ = xtb_energy_and_gradient(z, g, method="GFN-FF")
            e_n.append(float(en))
            e_x.append(ex)
            fn = np.asarray(fn).ravel()
            fx_ = np.asarray(fx_).ravel()
            if np.linalg.norm(fn) > 1e-6 and np.linalg.norm(fx_) > 1e-6:
                cosines.append(
                    fn @ fx_ / (np.linalg.norm(fn) * np.linalg.norm(fx_))
                )
        all_dn.extend(np.array(e_n) - np.mean(e_n))
        all_dx.extend(np.array(e_x) - np.mean(e_x))
    rmse = np.sqrt(np.mean((np.array(all_dn) - np.array(all_dx)) ** 2))
    assert rmse < 2.0  # relative energies parallel
    assert np.mean(cosines) > 0.7  # forces point the same way


def test_heteroatom_elements_robust():
    """S/P/Cl-containing molecules: finite energies/forces and stable
    optimization under the generated FF (fallback element parameters)."""
    from firecode_tpu.opt.fire import optimize_batch

    systems = {
        # methanethiol
        "CH3SH": (np.array([6, 16, 1, 1, 1, 1]),
                  np.array([[0.0, 0, 0], [1.82, 0, 0], [2.2, 1.2, 0],
                            [-0.37, 0.5, 0.88], [-0.37, 0.5, -0.88],
                            [-0.37, -1.02, 0.0]])),
        # chloromethane
        "CH3Cl": (np.array([6, 17, 1, 1, 1]),
                  np.array([[0.0, 0, 0], [1.78, 0, 0],
                            [-0.37, 0.5, 0.88], [-0.37, 0.5, -0.88],
                            [-0.37, -1.02, 0.0]])),
        # phosphine
        "PH3": (np.array([15, 1, 1, 1]),
                np.array([[0.0, 0, 0], [1.21, 0.6, 0], [-1.0, 0.9, 0],
                          [0.0, -0.55, 1.25]])),
    }
    for name, (z, x) in systems.items():
        calc = GFNFF(z, x)
        e, f = calc.energy_and_forces(jnp.asarray(x))
        assert np.isfinite(float(e)) and np.isfinite(np.asarray(f)).all(), name
        res = optimize_batch(calc, jnp.asarray(x)[None], fmax=0.1, max_steps=2000)
        assert bool(res.converged[0]), name
        xo = np.asarray(res.coords[0])
        # molecule intact: every bonded pair within 1.4x covalent sum
        from firecode_tpu.graphs import graphize
        from firecode_tpu.pt import COVALENT_RADII

        g = graphize(z, x)
        for i, j in g.edges:
            d = np.linalg.norm(xo[i] - xo[j])
            rs = COVALENT_RADII[z[i]] + COVALENT_RADII[z[j]]
            assert d < 1.4 * rs, (name, i, j, d)


def test_halogen_bond_triplets_and_attraction():
    """Cl on carbon + an O acceptor generates XB triplets and a directional
    sigma-hole attraction at the contact geometry."""
    from firecode_tpu.calculators.gfnff import build_gfnff_topology
    from firecode_tpu.calculators.gfnff.energy import gfnff_energy
    from firecode_tpu.calculators.gfnff.params import load_fitted

    # CH3Cl ... OH2, Cl...O along the C-Cl axis (sigma hole)
    z = np.array([6, 17, 1, 1, 1, 8, 1, 1])
    x = np.array([
        [0.0, 0, 0], [1.78, 0, 0],
        [-0.37, 0.5, 0.88], [-0.37, 0.5, -0.88], [-0.37, -1.02, 0.0],
        [4.7, 0, 0], [5.1, 0.76, 0.4], [5.1, -0.76, 0.4],
    ])
    top = build_gfnff_topology(z, x)
    assert top.xb.shape[0] >= 1
    p = load_fitted().asdict()
    e_contact = float(gfnff_energy(jnp.asarray(x), top, p))
    x_far = x.copy()
    x_far[5:] += 40.0
    e_far = float(gfnff_energy(jnp.asarray(x_far), top, p))
    assert e_far > e_contact - 5.0  # bound or near-flat, never a wall


def test_energy_terms_breakdown_sums_to_total(ethanol_calc):
    from firecode_tpu.calculators.gfnff import gfnff_energy_terms

    z, x, calc = ethanol_calc
    terms = gfnff_energy_terms(jnp.asarray(x), calc.topology, calc.params)
    assert set(terms) == {
        "bond", "angle", "torsion", "oop", "rep", "disp", "atm", "es", "hb",
        "xb",
    }
    total = float(calc.energy(jnp.asarray(x)))
    assert abs(sum(float(v) for v in terms.values()) - total) < 1e-9
    assert float(terms["bond"]) < 0  # bound molecule


def test_topo_charges_mode():
    """eeq="topo" (published-GFN-FF fixed setup charges): finite, rigid-
    motion invariant, optimizable, and its torsion RELATIVE energetics
    track the variational surface (charges barely flow on rotation)."""
    from firecode_tpu.calculators.gfnff import gfnff_energy
    from firecode_tpu.opt.fire import optimize_batch

    z, xe = fx.ethane()
    var = GFNFF(z, xe)
    topo = GFNFF(z, xe, eeq="topo")
    assert topo.name == "gfnff-topo"

    # forces finite + match finite differences through the fixed-charge ES
    g = jax.grad(lambda c: gfnff_energy(c, topo.topology, topo.params, eeq="topo"))(
        jnp.asarray(xe)
    )
    assert np.isfinite(np.asarray(g)).all()

    # ethane barrier: same rigid scan through both ES modes
    from firecode_tpu.ops.torsion_ops import rotate_dihedral

    mask = np.zeros(len(z), bool)
    mask[[5, 6, 7]] = True
    frames = rotate_dihedral(
        jnp.broadcast_to(jnp.asarray(xe), (2, len(z), 3)),
        jnp.asarray(np.array([2, 0, 1, 5], np.int32)),
        jnp.asarray([0.0, 60.0]),
        jnp.asarray(mask),
    )
    def barrier(calc):
        e = [float(calc.energy(frames[i])) for i in range(2)]
        return e[1] - e[0]

    bv, bt = barrier(var), barrier(topo)
    assert abs(bv - bt) < 0.3  # ES barely moves an alkane torsion barrier

    # batched FIRE runs and converges on the fast path
    res = optimize_batch(topo, jnp.asarray(xe)[None], fmax=0.05, max_steps=1500)
    assert bool(np.asarray(res.converged)[0])


def test_dispatcher_topo_surface():
    from firecode_tpu.calculators.dispatcher import Dispatcher
    from firecode_tpu.sample_molecules import build_ethanol

    z, x = build_ethanol()
    calc = Dispatcher("GFNFF-TOPO").get_batch_calc(z, x)
    e, g = calc.energy_and_forces(jnp.asarray(np.stack([x, x + 0.01])))
    assert np.isfinite(np.asarray(e)).all() and np.isfinite(np.asarray(g)).all()


def test_warm_eeq_state_path_matches_variational(ethanol_calc):
    """The optimizer fast path (warm-started, gradient-detached EEQ —
    energy.eeq_energy_charges_warm) must reproduce the variational
    energies and forces to solver precision: the Schur recombination
    enforces the charge constraint exactly, so the Hellmann-Feynman
    force error is bounded by the CG residual alone."""
    z, x, calc = ethanol_calc
    assert calc.stateful  # variational GFNFF advertises the fast path

    rng = np.random.default_rng(7)
    batch = jnp.asarray(
        np.stack([x + rng.normal(scale=0.08, size=x.shape) for _ in range(5)])
    )
    e_ref, f_ref = calc.energy_and_forces(batch)
    state = calc.init_state(batch)
    e_w, f_w, state2 = calc.energy_and_forces_state(batch, state)
    scale = float(jnp.max(jnp.abs(f_ref)))
    assert float(jnp.max(jnp.abs(e_w - e_ref))) < 1e-8
    assert float(jnp.max(jnp.abs(f_w - f_ref))) < 1e-8 * max(scale, 1.0)
    # the refreshed state keeps the contract on a moved geometry
    moved = batch + 0.02
    e_m, f_m, _ = calc.energy_and_forces_state(moved, state2)
    e_mr, f_mr = calc.energy_and_forces(moved)
    assert float(jnp.max(jnp.abs(f_m - f_mr))) < 1e-8 * max(scale, 1.0)


def test_warm_fire_matches_stateless_fire(ethanol_calc):
    """optimize_batch takes the warm-start path automatically for
    stateful calculators; converged minima must match the stateless
    (custom_linear_solve) route."""
    from firecode_tpu.opt.fire import optimize_batch

    z, x, calc = ethanol_calc
    rng = np.random.default_rng(11)
    batch = jnp.asarray(
        np.stack([x + rng.normal(scale=0.05, size=x.shape) for _ in range(4)])
    )
    res_warm = optimize_batch(calc, batch, fmax=0.02, max_steps=2000)
    cold = GFNFF(z, x)
    cold.stateful = False
    res_cold = optimize_batch(cold, batch, fmax=0.02, max_steps=2000)
    assert bool(jnp.all(res_warm.converged))
    assert bool(jnp.all(res_cold.converged))
    assert float(jnp.max(jnp.abs(res_warm.energy - res_cold.energy))) < 1e-5


def test_warm_state_composes_with_constraints(ethanol_calc):
    """with_extra (penalty constraints) must preserve the warm-start
    protocol: the composed calculator still advertises and carries EEQ
    state, and its stateful forces equal the stateless composed forces
    (base Hellmann-Feynman + exact penalty gradient)."""
    from firecode_tpu.opt.constraints import Constraints

    z, x, calc = ethanol_calc
    cons = Constraints()
    cons.add_distance(0, 1, 1.60)
    composed = calc.with_extra(cons.energy_fn())
    assert composed.stateful

    rng = np.random.default_rng(3)
    batch = jnp.asarray(
        np.stack([x + rng.normal(scale=0.05, size=x.shape) for _ in range(3)])
    )
    e_ref, f_ref = composed.energy_and_forces(batch)
    state = composed.init_state(batch)
    e_w, f_w, _ = composed.energy_and_forces_state(batch, state)
    scale = float(jnp.max(jnp.abs(f_ref)))
    assert float(jnp.max(jnp.abs(e_w - e_ref))) < 1e-8
    assert float(jnp.max(jnp.abs(f_w - f_ref))) < 1e-8 * max(scale, 1.0)


def test_remote_neutral_hb_in_ion_not_charge_boosted():
    """A neutral-region H-bond inside an ionic system must NOT receive the
    charge-assisted boost (advisor r4): the hb_qd/hb_qa features use the
    EXCESS charge vs the neutral-parent EEQ solve, which is ~0 away from
    the charged site. System: NH4+ with a water dimer 15 A away (total
    charge +1, site = NH4). The water-dimer donor triplet's features must
    be ~0 while the NH4+ donor triplets toward the waters carry the
    donor-side excess charge."""
    from firecode_tpu.calculators.gfnff import build_gfnff_topology

    z_aw, x_aw = fx.ammonium_water()   # [N,4xH, O,2xH]
    z_wd, x_wd = fx.water_dimer()      # [O_a,H,H, O_d,H_d,H] (acceptor first)
    # keep only NH4+ from the first fixture; park the dimer far away
    z = np.concatenate([z_aw[:5], z_wd])
    x = np.vstack([x_aw[:5], x_wd + np.array([15.0, 0.0, 0.0])])

    top = build_gfnff_topology(
        z, x, charge=1, charge_site=[0, 1, 2, 3, 4], site_charge_target=1.0
    )
    hb = np.asarray(top.hb)
    qd = np.asarray(top.hb_qd)
    qa = np.asarray(top.hb_qa)
    assert len(hb), "expected HB triplets"

    # triplets fully inside the remote water dimer: no boost
    dimer_atoms = set(range(5, 11))
    remote = np.array([all(int(i) in dimer_atoms for i in t) for t in hb])
    assert remote.any(), "expected a water-dimer internal HB triplet"
    assert float(np.max(qd[remote])) < 0.05
    assert float(np.max(qa[remote])) < 0.05

    # NH4+ donor triplets (donor N=0) carry the donor-side excess charge
    # (~0.33 e raw -> ~0.17 after the 0.15 e leak deadzone)
    nh4_donor = hb[:, 0] == 0
    assert nh4_donor.any()
    assert float(np.max(qd[nh4_donor])) > 0.1
