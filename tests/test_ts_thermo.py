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
