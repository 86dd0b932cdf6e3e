import numpy as np
import jax
import jax.numpy as jnp

from firecode_tpu.calculators import LiteFF
from firecode_tpu.calculators.solvation import (
    delta_solvation_energies,
    qeq_charges,
    solvate,
    solvation_energy_fn,
    CHI,
    ETA,
)
from tests.test_calculator_opt import WATER, WATER_Z


def test_qeq_charges_sum_and_sign():
    chi = jnp.asarray(CHI[WATER_Z])
    eta = jnp.asarray(ETA[WATER_Z])
    q = np.asarray(qeq_charges(jnp.asarray(WATER), chi, eta, 0.0))
    assert abs(q.sum()) < 1e-8
    assert q[0] < 0  # O negative
    assert q[1] > 0 and q[2] > 0  # H positive


def test_qeq_total_charge_respected():
    chi = jnp.asarray(CHI[WATER_Z])
    eta = jnp.asarray(ETA[WATER_Z])
    q = np.asarray(qeq_charges(jnp.asarray(WATER), chi, eta, -1.0))
    assert abs(q.sum() + 1.0) < 1e-8


def test_qeq_schur_cg_matches_dense_kkt():
    """The Schur-complement CG path reproduces the bordered-KKT dense solve
    it replaced (same minimizer, constraint eliminated analytically)."""
    chi = jnp.asarray(CHI[WATER_Z])
    eta = jnp.asarray(ETA[WATER_Z])
    from firecode_tpu.calculators.solvation import COULOMB, EV_TO_KCAL

    c = jnp.asarray(WATER)
    n = c.shape[0]
    diff = c[:, None, :] - c[None, :, :]
    r2 = jnp.sum(diff * diff, axis=-1)
    gamma_len = COULOMB / (0.5 * (eta[:, None] + eta[None, :]) * EV_TO_KCAL)
    j_off = COULOMB / jnp.sqrt(r2 + gamma_len**2)
    a = j_off * (1.0 - jnp.eye(n)) + jnp.diag(eta * EV_TO_KCAL)
    for total in (0.0, -1.0):
        ones = jnp.ones((n, 1))
        kkt = jnp.block([[a, ones], [ones.T, jnp.zeros((1, 1))]])
        rhs = jnp.concatenate([-chi * EV_TO_KCAL, jnp.array([total])])
        q_dense = np.asarray(jnp.linalg.solve(kkt, rhs))[:n]
        q_cg = np.asarray(qeq_charges(c, chi, eta, total))
        assert np.abs(q_cg - q_dense).max() < 1e-10


def test_solvation_energy_negative_for_water_in_water():
    fn = solvation_energy_fn(WATER_Z, "water")
    e = float(fn(jnp.asarray(WATER)))
    # polar stabilization should dominate the small SASA penalty
    assert e < 0


def test_solvation_forces_finite_and_correct(rng):
    fn = solvation_energy_fn(WATER_Z, "water")
    g = jax.grad(fn)(jnp.asarray(WATER))
    g = np.asarray(g)
    assert np.all(np.isfinite(g))
    eps = 1e-6
    cp = WATER.copy()
    cp[1, 0] += eps
    cm = WATER.copy()
    cm[1, 0] -= eps
    fd = (float(fn(jnp.asarray(cp))) - float(fn(jnp.asarray(cm)))) / (2 * eps)
    assert abs(fd - g[1, 0]) < 1e-4


def test_delta_solvation_changes_energy():
    # reference acceptance analog: delta-solvation changes energy by >1e-3
    # kcal/mol (reference test_suite.py:285-287)
    delta = delta_solvation_energies(None, WATER_Z, WATER[None], "water")
    assert abs(delta[0]) > 1e-3


def test_solvated_calculator_composition():
    calc = LiteFF(WATER_Z, WATER)
    solv = solvate(calc, WATER_Z, "water")
    e_gas = float(calc.energy(jnp.asarray(WATER)))
    e_solv = float(solv.energy(jnp.asarray(WATER)))
    assert abs(e_solv - e_gas) > 1e-3
    # batched evaluation works
    batch = jnp.asarray(np.stack([WATER, WATER + 0.01]))
    e2, f2 = solv.energy_and_forces(batch)
    assert e2.shape == (2,)
    assert np.all(np.isfinite(np.asarray(f2)))


def test_epsilon_scaling():
    # higher dielectric -> more polar stabilization
    e_water = float(solvation_energy_fn(WATER_Z, "water")(jnp.asarray(WATER)))
    e_hexane = float(solvation_energy_fn(WATER_Z, "hexane")(jnp.asarray(WATER)))
    assert e_water < e_hexane
