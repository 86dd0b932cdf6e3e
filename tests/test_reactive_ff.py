"""LiteFF-R reactive potential: minima, barriers, and saddle curvature.

Covers the reference capability of a reactive PES (firecode/calculators/
xtb.py:39-347 delegates this to the external GFN binaries): bonds must be
able to break and form, an identity-exchange reaction must have a positive
barrier with exactly one imaginary mode at the saddle, and the SN2 at carbon
must show the gas-phase double-well topology.
"""

import shutil

import jax.numpy as jnp
import numpy as np
import pytest

from firecode_tpu.calculators.reactive_ff import (
    ReactiveFF,
    bond_orders,
    build_reactive_params,
    eeq_charges,
    reactive_energy,
)
from firecode_tpu.opt.fire import optimize_batch


def _h3_reactant_energy(calc):
    c = jnp.asarray([[0.0, 0, 0], [0.78, 0, 0], [40.0, 0, 0]])
    return float(calc.energy_one(c))


def test_h2_morse_well_and_dissociation():
    calc = ReactiveFF(np.array([1, 1]))

    def e(r):
        return float(calc.energy_one(jnp.asarray([[0.0, 0, 0], [r, 0, 0]])))

    rs = np.arange(0.5, 3.0, 0.02)
    es = np.array([e(r) for r in rs])
    r_min = rs[np.argmin(es)]
    assert 0.70 < r_min < 0.90  # reference H2 at 0.741
    assert -115 < es.min() < -80  # ~ D(H-H) = 104 kcal/mol
    assert abs(e(40.0)) < 1.0  # dissociates to separated atoms
    assert e(0.28) > 0  # repulsive wall (Morse zero-crossing ~ 0.36 A for H2)
    assert e(0.45) > es.min() + 30  # wall rising steeply inside the well


def test_forces_are_exact_gradients():
    calc = ReactiveFF(np.array([8, 1, 1]))
    c0 = np.array([[0.0, 0, 0], [0.97, 0, 0], [-0.25, 0.94, 0]])
    _, f = calc.energy_and_forces(jnp.asarray(c0))
    f = np.asarray(f)
    eps = 1e-5
    for i in range(3):
        for d in range(3):
            cp, cm = c0.copy(), c0.copy()
            cp[i, d] += eps
            cm[i, d] -= eps
            fd = -(float(calc.energy_one(jnp.asarray(cp))) - float(calc.energy_one(jnp.asarray(cm)))) / (2 * eps)
            assert abs(fd - f[i, d]) < 1e-4


def test_batched_energy_matches_per_structure():
    calc = ReactiveFF(np.array([6, 1, 1, 1, 1]))
    rng = np.random.default_rng(3)
    td = np.array(
        [[0.0, 0, 0], [0.63, 0.63, 0.63], [-0.63, -0.63, 0.63], [0.63, -0.63, -0.63], [-0.63, 0.63, -0.63]]
    )
    batch = td[None] + rng.normal(scale=0.05, size=(4, 5, 3))
    e_b = np.asarray(calc.energy(jnp.asarray(batch)))
    e_1 = np.array([float(calc.energy_one(jnp.asarray(c))) for c in batch])
    np.testing.assert_allclose(e_b, e_1, rtol=1e-10)


def test_methane_geometry():
    rng = np.random.default_rng(0)
    td = np.array(
        [[0.0, 0, 0], [0.63, 0.63, 0.63], [-0.63, -0.63, 0.63], [0.63, -0.63, -0.63], [-0.63, 0.63, -0.63]]
    )
    calc = ReactiveFF(np.array([6, 1, 1, 1, 1]))
    res = optimize_batch(calc, (td + rng.normal(scale=0.1, size=td.shape))[None], fmax=0.02, max_steps=4000)
    assert bool(res.converged[0])
    c = np.asarray(res.coords[0])
    for i in range(1, 5):
        assert 1.00 < np.linalg.norm(c[0] - c[i]) < 1.25
    import itertools

    for i, j in itertools.combinations(range(1, 5), 2):
        v1, v2 = c[i] - c[0], c[j] - c[0]
        ang = np.degrees(np.arccos(v1 @ v2 / np.linalg.norm(v1) / np.linalg.norm(v2)))
        assert 105 < ang < 114


def test_water_geometry():
    rng = np.random.default_rng(1)
    w0 = np.array([[0.0, 0, 0], [0.96, 0, 0], [-0.24, 0.93, 0]])
    calc = ReactiveFF(np.array([8, 1, 1]))
    res = optimize_batch(calc, (w0 + rng.normal(scale=0.05, size=w0.shape))[None], fmax=0.02, max_steps=4000)
    c = np.asarray(res.coords[0])
    for i in (1, 2):
        assert 0.90 < np.linalg.norm(c[0] - c[i]) < 1.10
    v1, v2 = c[1] - c[0], c[2] - c[0]
    ang = np.degrees(np.arccos(v1 @ v2 / np.linalg.norm(v1) / np.linalg.norm(v2)))
    assert 100 < ang < 125


def test_ethane_stays_intact():
    """No topology exists, yet optimization must preserve the molecule."""
    rng = np.random.default_rng(2)
    eth = np.array(
        [
            [0.0, 0, 0.77], [0, 0, -0.77],
            [1.02, 0, 1.16], [-0.51, 0.88, 1.16], [-0.51, -0.88, 1.16],
            [1.02, 0, -1.16], [-0.51, 0.88, -1.16], [-0.51, -0.88, -1.16],
        ]
    )
    z = np.array([6, 6, 1, 1, 1, 1, 1, 1])
    calc = ReactiveFF(z)
    res = optimize_batch(calc, (eth + rng.normal(scale=0.08, size=eth.shape))[None], fmax=0.02, max_steps=4000)
    c = np.asarray(res.coords[0])
    assert 1.40 < np.linalg.norm(c[0] - c[1]) < 1.80  # C-C intact
    for h in range(2, 5):
        assert np.linalg.norm(c[0] - c[h]) < 1.3  # C1-H intact
    for h in range(5, 8):
        assert np.linalg.norm(c[1] - c[h]) < 1.3


def test_eeq_charges_polarity_and_conservation():
    p = build_reactive_params(np.array([8, 1, 1]))
    c = jnp.asarray([[0.0, 0, 0], [0.97, 0, 0], [-0.25, 0.94, 0]])
    q = np.asarray(eeq_charges(c, p))
    assert abs(q.sum()) < 1e-8
    assert q[0] < -0.2  # oxygen negative
    assert q[1] > 0.1 and q[2] > 0.1
    p_ion = build_reactive_params(np.array([17, 6, 1, 1, 1, 17]), charge=-1)
    g = np.zeros((6, 3))
    g[0], g[5] = [-2.4, 0, 0], [2.4, 0, 0]
    for k, phi in enumerate([0, 2.0944, 4.1888]):
        g[2 + k] = [0, 1.07 * np.cos(phi), 1.07 * np.sin(phi)]
    q = np.asarray(eeq_charges(jnp.asarray(g), p_ion))
    assert abs(q.sum() + 1.0) < 1e-8


def test_bond_orders_profile():
    p = build_reactive_params(np.array([6, 6]))
    for r, lo, hi in [(1.3, 0.9, 1.01), (1.52, 0.9, 1.01), (2.0, 0.3, 0.7), (3.0, 0.0, 0.02)]:
        bo = np.asarray(bond_orders(jnp.asarray([[0.0, 0, 0], [r, 0, 0]]), p))
        assert lo <= bo[0, 1] <= hi, (r, bo[0, 1])


def test_h_exchange_neb_barrier_and_single_imaginary_mode():
    """The VERDICT round-1 acceptance test: native neb> on H2 + H -> H + H2."""
    from firecode_tpu.opt.hessian import frequencies
    from firecode_tpu.opt.neb import run_neb
    from firecode_tpu.opt.saddle import saddle_refine

    z = np.array([1, 1, 1])
    calc = ReactiveFF(z)
    start = np.array([[0.0, 0, 0], [0.78, 0, 0], [2.9, 0, 0]])
    end = np.array([[-2.12, 0, 0], [0.0, 0, 0], [0.78, 0, 0]])
    r0 = optimize_batch(calc, np.stack([start, end]), fmax=0.01, max_steps=2000)
    s, e = np.asarray(r0.coords[0]), np.asarray(r0.coords[1])
    res = run_neb(calc, s, e, n_images=11)
    assert res.converged
    rel = res.energies - res.energies[0]
    barrier = rel.max()
    assert 3.0 < barrier < 30.0  # real H3 barrier is 9.6 kcal/mol
    assert abs(rel[-1]) < 0.5  # identity reaction: thermoneutral

    sr = saddle_refine(calc, res.ts_coords)
    assert sr.converged
    ts = sr.coords
    r1 = np.linalg.norm(ts[1] - ts[0])
    r2 = np.linalg.norm(ts[2] - ts[1])
    assert abs(r1 - r2) < 0.05  # symmetric TS
    freqs, n_imag = frequencies(calc, z, ts, expect_ts=True)
    assert n_imag == 1
    assert freqs[0] < -100  # a real imaginary mode, not numerical noise


def test_sn2_symmetric_saddle_single_imaginary_mode():
    from firecode_tpu.opt.hessian import frequencies
    from firecode_tpu.opt.saddle import saddle_refine

    z = np.array([17, 6, 1, 1, 1, 17])
    calc = ReactiveFF(z, charge=-1)
    d = 2.4
    g = np.zeros((6, 3))
    g[0], g[5] = [-d, 0, 0], [d, 0, 0]
    for k, phi in enumerate([0, 2.0944, 4.1888]):
        g[2 + k] = [0, 1.07 * np.cos(phi), 1.07 * np.sin(phi)]
    sr = saddle_refine(calc, g, fmax=0.02, max_steps=400)
    assert sr.converged
    ts = sr.coords
    d1 = np.linalg.norm(ts[1] - ts[0])
    d2 = np.linalg.norm(ts[1] - ts[5])
    assert abs(d1 - d2) < 0.05  # symmetric [Cl...CH3...Cl]- saddle
    assert 2.0 < d1 < 3.0
    freqs, n_imag = frequencies(calc, z, ts, expect_ts=True)
    assert n_imag == 1
    assert freqs[0] < -100


def test_dispatcher_liteff_r():
    from firecode_tpu.calculators.dispatcher import Dispatcher

    calc = Dispatcher("LITEFF-R").get_batch_calc(
        np.array([1, 1]), np.array([[[0.0, 0, 0], [0.74, 0, 0]]])
    )
    assert calc.name == "liteff-r"
    assert float(calc.energy_one(jnp.asarray([[0.0, 0, 0], [0.74, 0, 0]]))) < -80


@pytest.mark.skipif(shutil.which("xtb") is None, reason="xtb binary not present")
def test_h3_barrier_cross_check_vs_xtb():
    """Gated oracle check: xtb must agree the H3 saddle sits above H2 + H."""
    from firecode_tpu.calculators.xtb_io import XTBHostCalculator

    xtb = XTBHostCalculator(np.array([1, 1, 1]), charge=0)
    ts = np.array([[-1.43, 0, 0], [0.0, 0, 0], [1.43, 0, 0]])
    reac = np.array([[0.0, 0, 0], [0.76, 0, 0], [20.0, 0, 0]])
    e = np.asarray(xtb.energy(np.stack([ts, reac])))
    assert e[0] > e[1]  # barrier is positive at the xtb level too

    calc = ReactiveFF(np.array([1, 1, 1]))
    e_n = np.array([float(calc.energy_one(jnp.asarray(c))) for c in (ts, reac)])
    assert e_n[0] > e_n[1]


def test_pi_twist_rigidity_ethylene():
    """VERDICT r2 item 6: alkene rotation must have a real barrier (within
    2x of the ~65 kcal/mol literature value)."""
    import jax.numpy as jnp

    from firecode_tpu.calculators.gfnff import fixtures as fx
    from firecode_tpu.calculators.reactive_ff import ReactiveFF
    from firecode_tpu.ops.torsion_ops import rotate_dihedral

    z, x = fx.ethylene()
    calc = ReactiveFF(z)
    mask = np.zeros(6, bool)
    mask[[4, 5]] = True
    angles = jnp.asarray(np.linspace(0.0, 90.0, 7))
    confs = rotate_dihedral(
        jnp.broadcast_to(jnp.asarray(x), (7, 6, 3)),
        jnp.asarray(np.array([2, 0, 1, 4], np.int32)),
        angles,
        jnp.asarray(mask),
    )
    e = np.asarray(calc.energy(confs))
    barrier = e.max() - e.min()
    assert 32.5 < barrier < 130.0
    assert e.argmax() == 6  # maximum at the perpendicular geometry


def test_biphenyl_atropisomer_profile_and_ts():
    """Real-biaryl fixture (VERDICT r2 item 6): the relaxed minimum is
    twisted (neither planar nor perpendicular), both rotation barriers
    exist, and a TS search from near-perpendicular converges to a saddle
    between the two mirror-twisted minima."""
    import jax.numpy as jnp

    from firecode_tpu.calculators.gfnff import fixtures as fx
    from firecode_tpu.calculators.reactive_ff import ReactiveFF
    from firecode_tpu.ops.algebra import dihedral
    from firecode_tpu.ops.torsion_ops import rotate_dihedral
    from firecode_tpu.opt.fire import optimize_batch

    from firecode_tpu.graphs import graphize
    from firecode_tpu.opt.constraints import new_bond_preventer

    z, x44 = fx.biphenyl(44.0)
    # production-faithful guard: the reference NEVER relaxes without its
    # anti-scrambling machinery (NewBondPreventer + scramble checks) — the
    # bare reactive surface may rearrange dense aromatics on long relaxations
    calc = ReactiveFF(z).with_extra(
        new_bond_preventer(z, graphize(z, x44)), name="liteff-r+nbp"
    )
    res = optimize_batch(calc, jnp.asarray(x44)[None], fmax=0.1, max_steps=2000)
    xmin = np.asarray(res.coords[0])
    emin = float(res.energy[0])
    quad = np.array([2, 0, 11, 13], np.int32)
    phi = float(dihedral(jnp.asarray(xmin)[quad][None])[0])
    folded = min(abs(phi), 180.0 - abs(phi))
    assert 15.0 < folded < 88.0  # twisted, not planar/perpendicular

    # rigid rotation from the model's own minimum: both walls exist
    mask = np.zeros(22, bool)
    mask[11:] = True
    def rigid_at(target):
        xr = rotate_dihedral(
            jnp.asarray(xmin)[None], jnp.asarray(quad),
            jnp.asarray([target - phi]), jnp.asarray(mask),
        )
        return float(calc.energy(xr[0]))

    e_planar = min(rigid_at(0.0), rigid_at(180.0))
    e_perp = rigid_at(90.0)
    assert e_planar > emin + 1.0  # ortho H-H clash barrier
    assert e_perp > emin + 0.3  # pi-rigidity barrier


def test_biphenyl_ts_search_gfnff():
    """Atropisomer TS search on a REAL atropisomer (2,2'-dimethylbiphenyl)
    with the generated GFN-FF: the ortho methyls force a twisted minimum;
    the racemization saddle is the anti-planar passage, located by
    constrained pre-relaxation + eigenvector following (the reference
    workflow, firecode/atropisomer_module.py:50-300)."""
    import jax.numpy as jnp

    from firecode_tpu.calculators.gfnff import GFNFF, fixtures as fx
    from firecode_tpu.ops.algebra import dihedral
    from firecode_tpu.ops.torsion_ops import rotate_dihedral
    from firecode_tpu.opt.constraints import Constraints
    from firecode_tpu.opt.fire import optimize_batch
    from firecode_tpu.opt.saddle import saddle_refine

    z, x0 = fx.dimethylbiphenyl(70.0)
    calc = GFNFF(z, x0)
    res = optimize_batch(calc, jnp.asarray(x0)[None], fmax=0.05, max_steps=4000)
    xmin = np.asarray(res.coords[0])
    emin = float(res.energy[0])
    quad = np.array([1, 0, 11, 12], np.int32)
    phi = float(dihedral(jnp.asarray(xmin)[quad][None])[0])
    folded = min(abs(phi), 180.0 - abs(phi))
    assert 20.0 < folded < 88.0  # strongly twisted equilibrium

    # anti-planar passage: ring B (+ its methyl) rigid-rotated, then relaxed
    # with the inter-ring dihedral held at 180, then EF saddle polish
    mask = np.zeros(len(z), bool)
    mask[11:22] = True
    mask[25:28] = True  # ring B methyl hydrogens
    x180 = np.asarray(
        rotate_dihedral(
            jnp.asarray(xmin)[None], jnp.asarray(quad),
            jnp.asarray([180.0 - phi]), jnp.asarray(mask),
        )
    )[0]
    cons = Constraints()
    cons.add_dihedral([int(q) for q in quad], 180.0)
    pre = optimize_batch(
        calc, jnp.asarray(x180)[None], constraints=cons, fmax=0.3, max_steps=2000
    )
    sres = saddle_refine(
        calc, np.asarray(pre.coords[0]), fmax=0.3, max_steps=150,
        trust_radius=0.05,
    )
    assert sres.converged
    phi_ts = float(dihedral(jnp.asarray(sres.coords)[quad][None])[0])
    assert min(abs(phi_ts), 180.0 - abs(phi_ts)) > 88.0 or abs(abs(phi_ts) - 180.0) < 25.0
    barrier = sres.energy - emin
    assert 3.0 < barrier < 60.0  # hindered-rotation barrier (exp ~17-20)


