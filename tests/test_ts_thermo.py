import numpy as np
import jax.numpy as jnp
import pytest

from firecode_tpu.calculators import LiteFF
from firecode_tpu.opt import optimize_batch
from firecode_tpu.opt.hessian import (
    batch_hessian,
    cleanup_frequencies,
    mass_weighted_frequencies,
)
from firecode_tpu.opt.neb import interpolate_band, run_neb
from firecode_tpu.opt.saddle import irc_relax, saddle_refine
from firecode_tpu.ops.torsion_ops import measure_dihedrals, rotate_dihedral
from firecode_tpu.thermo import get_free_energies, rrho_thermo
from firecode_tpu.sample_molecules import build_alkane
from tests.test_calculator_opt import WATER, WATER_Z


def _relaxed_water():
    calc = LiteFF(WATER_Z, WATER)
    res = optimize_batch(calc, WATER, fmax=1e-4, max_steps=5000)
    return calc, np.asarray(res.coords)


def test_hessian_matches_finite_difference(rng):
    calc, coords = _relaxed_water()
    h = np.asarray(batch_hessian(calc, jnp.asarray(coords)))
    assert h.shape == (9, 9)
    np.testing.assert_allclose(h, h.T, atol=1e-8)
    # finite-difference check of a few entries
    eps = 1e-5
    flat = coords.reshape(-1)
    for k in (0, 4, 8):
        xp = flat.copy()
        xp[k] += eps
        xm = flat.copy()
        xm[k] -= eps
        _, fp = calc.energy_and_forces(jnp.asarray(xp.reshape(3, 3)))
        _, fm = calc.energy_and_forces(jnp.asarray(xm.reshape(3, 3)))
        fd_row = -(np.asarray(fp).reshape(-1) - np.asarray(fm).reshape(-1)) / (2 * eps)
        np.testing.assert_allclose(h[k], fd_row, atol=1e-4)


def test_water_frequencies():
    calc, coords = _relaxed_water()
    h = np.asarray(batch_hessian(calc, jnp.asarray(coords)))
    freqs, _ = mass_weighted_frequencies(h, WATER_Z)
    vib, n_imag = cleanup_frequencies(freqs, coords)
    assert len(vib) == 3  # 3N - 6
    assert n_imag == 0
    assert np.all(vib > 100.0)  # real molecular vibrations, not noise


def test_rrho_thermo_values():
    calc, coords = _relaxed_water()
    h = np.asarray(batch_hessian(calc, jnp.asarray(coords)))
    freqs, _ = mass_weighted_frequencies(h, WATER_Z)
    vib, _ = cleanup_frequencies(freqs, coords)
    data = rrho_thermo(vib, coords, WATER_Z, T=298.15)
    assert data["zpe"] > 0
    assert data["s_trans"] > 0
    assert data["s_rot"] > 0
    assert data["h_corr"] > data["zpe"]
    # G_corr = H - T*S should be well below H
    assert data["g_corr"] < data["h_corr"]


def test_get_free_energies_batched(rng):
    calc, coords = _relaxed_water()
    batch = np.stack([coords, coords + rng.normal(scale=1e-4, size=coords.shape)])
    gs = get_free_energies(calc, WATER_Z, batch, T=298.15)
    assert gs.shape == (2,)
    assert abs(gs[0] - gs[1]) < 0.5  # nearly identical structures


@pytest.fixture(scope="module")
def butane_endpoints():
    atomnos, coords = build_alkane(4)
    calc = LiteFF(atomnos, coords)
    quad = jnp.asarray([0, 1, 2, 3])
    import networkx  # noqa: F401

    from firecode_tpu.graphs import graphize, rotation_mask

    graph = graphize(atomnos, coords)
    mask = jnp.asarray(rotation_mask(graph, (0, 1, 2, 3)))
    # rotate anti -> gauche
    gauche = np.asarray(rotate_dihedral(jnp.asarray(coords), quad, 120.0, mask))
    res = optimize_batch(calc, np.stack([coords, gauche]), fmax=0.01, max_steps=3000)
    ends = np.asarray(res.coords)
    return atomnos, calc, ends[0], ends[1]


def test_neb_butane_rotation(butane_endpoints):
    atomnos, calc, anti, gauche = butane_endpoints
    result = run_neb(calc, anti, gauche, n_images=9)
    assert result.converged
    barrier = result.ts_energy - result.energies[0]
    assert 0.5 < barrier < 20.0  # a real torsional barrier on LiteFF
    # interior maximum, not an endpoint
    assert 0 < result.ts_index < len(result.images) - 1


def test_saddle_refine_from_neb_ts(butane_endpoints):
    atomnos, calc, anti, gauche = butane_endpoints
    neb = run_neb(calc, anti, gauche, n_images=9)
    result = saddle_refine(calc, neb.ts_coords, fmax=0.02, max_steps=200)
    assert result.converged
    # exactly one imaginary frequency at the saddle
    h = np.asarray(batch_hessian(calc, jnp.asarray(result.coords)))
    freqs, _ = mass_weighted_frequencies(h, atomnos)
    vib, n_imag = cleanup_frequencies(freqs, result.coords, expect_ts=True)
    assert n_imag == 1

    # IRC relaxation reaches two distinct minima
    fwd, rev = irc_relax(calc, result.coords, atomnos)
    e_fwd = float(calc.energy(jnp.asarray(fwd)))
    e_rev = float(calc.energy(jnp.asarray(rev)))
    assert e_fwd < result.energy
    assert e_rev < result.energy


def test_interpolate_band_shapes():
    a = np.zeros((4, 3))
    b = np.ones((4, 3))
    band = interpolate_band(a, b, 7)
    assert band.shape == (7, 4, 3)
    np.testing.assert_allclose(band[0], a)
    np.testing.assert_allclose(band[-1], b)
    mid = np.full((4, 3), 0.3)
    band2 = interpolate_band(a, b, 8, ts_guess=mid)
    assert band2.shape == (8, 4, 3)
    np.testing.assert_allclose(band2[4], mid)


def test_thermo_literature_values():
    """Sackur-Tetrode and rigid-rotor entropies vs textbook water values."""
    from firecode_tpu.thermo import rotational_entropy, translational_entropy

    # S_trans(H2O, 298.15 K, 1 atm) = 34.61 cal/(mol K)
    s_t = translational_entropy(18.015, 298.15, P_atm=1.0) * 1000
    assert abs(s_t - 34.61) < 0.1
    # S_rot(H2O, sigma=2) ~ 10.4 cal/(mol K) (geometry-dependent)
    s_r = rotational_entropy(WATER, WATER_Z, 298.15, sigma=2) * 1000
    assert abs(s_r - 10.4) < 0.3
    # solution reference state (1 M) lowers S_trans vs 1 atm gas
    s_sol = translational_entropy(18.015, 298.15, C_mol_l=1.0) * 1000
    assert s_sol < s_t


@pytest.mark.slow
def test_dryrun_multichip_entry():
    """The driver-validated multi-chip path keeps working."""
    import __graft_entry__ as g

    g.dryrun_multichip(4)


def test_idpp_interpolation_avoids_collisions(butane_endpoints):
    """IDPP keeps interatomic distances sane where linear interpolation
    collapses them (rotating methyl H's)."""
    from firecode_tpu.opt.neb import idpp_interpolate, interpolate_band

    atomnos, calc, anti, gauche = butane_endpoints
    linear = interpolate_band(anti, gauche, 9)
    idpp = idpp_interpolate(anti, gauche, 9)
    assert idpp.shape == linear.shape
    np.testing.assert_allclose(idpp[0], anti, atol=1e-5)
    np.testing.assert_allclose(idpp[-1], gauche, atol=1e-5)

    def min_dist(band):
        out = []
        for frame in band[1:-1]:
            d = np.linalg.norm(frame[:, None] - frame[None, :], axis=-1)
            np.fill_diagonal(d, 10.0)
            out.append(d.min())
        return min(out)

    # idpp intermediate images should not compress the closest contact more
    # than the linear path does
    assert min_dist(idpp) >= min_dist(linear) - 1e-6


# ---------------------------------------------------------------- golden
# Component-level golden checks of the qRRHO formulas (VERDICT round-1
# item 8), computed from first principles in the test body.

WATER = np.array([[0.0, 0.0, 0.119], [0.0, 0.763, -0.477], [0.0, -0.763, -0.477]])
WATER_Z = np.array([8, 1, 1])
WATER_FREQS = np.array([1595.0, 3657.0, 3756.0])


def test_water_zpe_golden():
    from firecode_tpu.thermo import zero_point_energy

    # ZPE = 0.5 h c sum(nu) Na: 0.5 * 9008 cm-1 -> 12.88 kcal/mol
    h, c, na = 6.62607015e-34, 2.99792458e10, 6.02214076e23
    want = 0.5 * h * c * WATER_FREQS.sum() * na / 4184.0
    assert abs(zero_point_energy(WATER_FREQS) - want) < 1e-6
    assert 12.5 < zero_point_energy(WATER_FREQS) < 13.2


def test_water_gas_translational_entropy_golden():
    from firecode_tpu.thermo import translational_entropy

    # textbook Sackur-Tetrode for H2O at 298.15 K, 1 atm: 34.61 cal/mol/K
    s = translational_entropy(18.015, 298.15, P_atm=1.0)
    assert abs(s * 1000.0 - 34.61) < 0.05


def test_solution_free_space_reduces_entropy():
    from firecode_tpu.thermo import translational_entropy

    s_gas_like = translational_entropy(18.015, 298.15, C_mol_l=1.0, solvent=None)
    s_solution = translational_entropy(18.015, 298.15, C_mol_l=1.0, solvent="water")
    # free space < 1 L/L => fewer accessible states => lower entropy
    assert s_solution < s_gas_like
    # the reduction is R ln(free_frac)
    from firecode_tpu.solvents import free_space_ml_per_l

    from firecode_tpu.units import R_KCAL

    want_delta = R_KCAL * np.log(free_space_ml_per_l("water") / 1000.0)
    assert abs((s_solution - s_gas_like) - want_delta) < 1e-9


def test_rotational_symmetry_number_golden():
    from firecode_tpu.thermo import rotational_entropy

    s1 = rotational_entropy(WATER, WATER_Z, 298.15, sigma=1)
    s2 = rotational_entropy(WATER, WATER_Z, 298.15, sigma=2)
    # S(sigma) = S(1) - R ln(sigma)
    from firecode_tpu.units import R_KCAL

    assert abs((s1 - s2) - R_KCAL * np.log(2.0)) < 1e-9
    # water's rigid-rotor S_rot (sigma=2) is ~10.4-10.5 cal/mol/K
    assert 10.0 < s2 * 1000.0 < 11.0


def test_rotational_sweep_table():
    from firecode_tpu.thermo import rotational_entropy_sweep

    table = rotational_entropy_sweep(WATER, WATER_Z, 298.15)
    assert len(table) == 12
    assert [sn for sn, _ in table] == list(range(1, 13))
    vals = [v for _, v in table]
    assert all(a > b for a, b in zip(vals, vals[1:]))  # decreasing with sigma


def test_rrho_thermo_components_and_orca_mock(tmp_path):
    from firecode_tpu.thermo import rrho_thermo, write_orca_mock_out

    data = rrho_thermo(WATER_FREQS, WATER, WATER_Z, T=298.15, P=1.0, C=None, sweep=True)
    # H_corr = ZPE + E_vib + 4 RT (3/2 trans + 3/2 rot + RT); water's thermal
    # vib energy is ~0 at 298 K (all modes > 1500 cm-1)
    from firecode_tpu.units import R_KCAL

    rt = R_KCAL * 298.15
    assert abs(data["h_corr"] - (data["zpe"] + 4.0 * rt)) < 0.01
    assert data["n_imag"] == 0
    assert len(data["rot_table"]) == 12

    write_orca_mock_out(
        tmp_path / "mock.out", WATER_Z, WATER_FREQS, -100.0, data, T=298.15
    )
    text = (tmp_path / "mock.out").read_text()
    assert "*** ORCA TERMINATED NORMALLY ***" in text
    assert "FINAL GIBBS FREE ENERGY" in text
    import re

    g_eh = float(re.search(r"FINAL GIBBS FREE ENERGY (-?\d+\.\d+)", text).group(1))
    from firecode_tpu.units import EH_TO_KCAL

    assert abs(g_eh * EH_TO_KCAL - (-100.0 + data["g_corr"])) < 1e-3


def test_qrrho_iav_uses_molecule_moments():
    from firecode_tpu.thermo import vibrational_entropy_qrrho

    lowfreqs = np.array([30.0, 60.0])
    s_small = vibrational_entropy_qrrho(lowfreqs, 298.15, i_av=1e-46)
    s_big = vibrational_entropy_qrrho(lowfreqs, 298.15, i_av=1e-43)
    # a larger average moment -> larger effective free-rotor moment -> more
    # free-rotor entropy for low modes
    assert s_big > s_small


def test_batched_multi_band_neb(rng):
    """run_neb_batch: R reactions relax as one device program per stage and
    reproduce the single-band results."""
    from firecode_tpu.calculators.reactive_ff import ReactiveFF
    from firecode_tpu.opt.fire import optimize_batch
    from firecode_tpu.opt.neb import run_neb, run_neb_batch

    z = np.array([1, 1, 1])
    calc = ReactiveFF(z)
    start = np.array([[0.0, 0, 0], [0.78, 0, 0], [2.9, 0, 0]])
    end = np.array([[-2.12, 0, 0], [0.0, 0, 0], [0.78, 0, 0]])
    r0 = optimize_batch(calc, np.stack([start, end]), fmax=0.01, max_steps=2000)
    s, e = np.asarray(r0.coords[0]), np.asarray(r0.coords[1])

    # two copies of the same reaction (one slightly perturbed endpoints)
    batch = run_neb_batch(
        calc, np.stack([s, s]), np.stack([e, e]), n_images=9
    )
    assert batch.images.shape == (2, 9, 3, 3)
    assert batch.converged.all()
    single = run_neb(calc, s, e, n_images=9)
    barrier_b = batch.ts_energy - batch.energies[:, 0]
    barrier_s = single.ts_energy - single.energies[0]
    np.testing.assert_allclose(barrier_b, barrier_s, atol=0.3)
    # the two identical bands agree with each other tightly
    np.testing.assert_allclose(batch.ts_energy[0], batch.ts_energy[1], atol=1e-6)
