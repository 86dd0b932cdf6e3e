"""Ensemble population / conformational-entropy analysis: analytic model
checks plus an end-to-end entropy> operator run (the native analog of
CREST's cregen / --entropy ensemble summary, which the reference reaches
only through the CREST binary)."""

import json

import numpy as np
import pytest

from firecode_tpu.ensemble_thermo import boltzmann_populations, ensemble_analysis
from firecode_tpu.units import R_KCAL
from tests.test_driver import rundir, run_input  # noqa: F401


def test_two_state_populations_analytic():
    # two levels split by dG: p1/p0 = exp(-dG/RT), closed form
    T, dg = 298.15, 1.0
    p = boltzmann_populations(np.array([0.0, dg]), T=T)
    k = np.exp(-dg / (R_KCAL * T))
    assert np.allclose(p, [1 / (1 + k), k / (1 + k)], atol=1e-12)
    assert np.isclose(p.sum(), 1.0)


def test_equal_levels_entropy_is_r_ln_n():
    # n degenerate conformers: S_conf = R ln n, G_conf = -RT ln n
    T, n = 298.15, 8
    res = ensemble_analysis(np.zeros(n), T=T)
    assert np.isclose(res["s_conf_cal_mol_k"], 1000 * R_KCAL * np.log(n), rtol=1e-10)
    assert np.isclose(res["g_conf_kcal"], -R_KCAL * T * np.log(n), rtol=1e-10)
    assert res["n_for_90pct"] == 8  # uniform: ceil(0.9*8) states needed


def test_degeneracy_equals_explicit_expansion():
    # one conformer with g=3 must match three explicit degenerate copies
    T = 298.15
    g = np.array([0.0, 1.2])
    a = ensemble_analysis(g, T=T, degeneracies=np.array([3.0, 1.0]))
    b = ensemble_analysis(np.array([0.0, 0.0, 0.0, 1.2]), T=T)
    assert np.isclose(a["s_conf_cal_mol_k"], b["s_conf_cal_mol_k"], rtol=1e-10)
    assert np.isclose(a["g_conf_kcal"], b["g_conf_kcal"], rtol=1e-10)
    # population of the degenerate conformer = sum of its expanded copies
    assert np.isclose(a["populations"][0], b["populations"][:3].sum(), rtol=1e-10)


def test_gibbs_identity_and_invariances():
    # <G> - T*S_conf == G_conf; populations invariant to energy shift and order
    rng = np.random.default_rng(3)
    g = rng.uniform(0.0, 3.0, size=25)
    T = 313.0
    res = ensemble_analysis(g, T=T)
    assert np.isclose(
        res["g_avg_kcal"] - T * res["s_conf_cal_mol_k"] / 1000.0,
        res["g_conf_kcal"],
        atol=1e-10,
    )
    shifted = ensemble_analysis(g + 100.0, T=T)
    assert np.allclose(shifted["populations"], res["populations"], atol=1e-12)
    assert np.isclose(
        shifted["g_conf_kcal"], res["g_conf_kcal"] + 100.0, atol=1e-9
    )
    perm = rng.permutation(len(g))
    permuted = ensemble_analysis(g[perm], T=T)
    assert np.allclose(permuted["populations"], res["populations"][perm])
    assert np.isclose(permuted["s_conf_cal_mol_k"], res["s_conf_cal_mol_k"])


def test_empty_and_single():
    empty = ensemble_analysis(np.array([]))
    assert empty["n_conformers"] == 0
    # empty input returns the FULL key set (callers must never KeyError)
    full = ensemble_analysis(np.array([5.0]))
    assert set(empty) == set(full)
    assert empty["s_conf_cal_mol_k"] == 0.0 and empty["n_for_90pct"] == 0
    assert np.isnan(empty["g_conf_kcal"])
    assert full["p_best"] == 1.0 and full["s_conf_cal_mol_k"] == 0.0
    assert full["g_conf_kcal"] == 5.0


def test_degeneracy_length_mismatch_raises():
    with pytest.raises(ValueError, match="degeneracies length"):
        ensemble_analysis(np.array([0.0, 1.0]), degeneracies=np.array([1.0]))
    with pytest.raises(ValueError, match="degeneracies length"):
        boltzmann_populations(np.array([0.0, 1.0]), degeneracies=np.array([1.0, 1.0, 2.0]))


def test_from_xyz_energies_kcal_roundtrip(tmp_path):
    # ADVICE r3 (medium): from_xyz stored Hartree while analysis()/the
    # Ensemble contract use kcal/mol, inflating gaps ~627x. Both from_xyz
    # and to_xyz now convert, so an Eh-commented file round-trips exactly.
    from firecode_tpu.ensemble import Ensemble
    from firecode_tpu.units import EH_TO_KCAL

    path = tmp_path / "two.xyz"
    e_h = np.array([-10.0, -10.0 + 1.0 / EH_TO_KCAL])  # 1 kcal/mol apart
    path.write_text(
        "".join(
            f"1\n{e:.12f} Eh\nH 0.0 0.0 {i:.1f}\n" for i, e in enumerate(e_h)
        )
    )
    ens = Ensemble.from_xyz(path, read_energies=True)
    assert np.allclose(ens.energies, e_h * EH_TO_KCAL)
    assert np.isclose(ens.rel_energies[1], 1.0)
    res = ens.analysis(T=298.15)
    # a 1 kcal/mol gap must NOT collapse the populations onto the minimum
    assert 0.1 < res["populations"][1] < 0.5
    out = tmp_path / "out.xyz"
    ens.to_xyz(out)
    again = Ensemble.from_xyz(out, read_energies=True)
    assert np.allclose(again.energies, ens.energies, atol=1e-6)


def test_ensemble_analysis_method():
    # the Ensemble container's convenience entry point (library users)
    from firecode_tpu.ensemble import Ensemble
    from firecode_tpu.pt import symbols_from_atomnos
    from firecode_tpu.sample_molecules import build_alkane

    atomnos, coords = build_alkane(4)
    ens = Ensemble(
        atoms=symbols_from_atomnos(atomnos),
        coords=np.stack([coords, coords + 0.01]),
        energies=np.array([0.0, 1.0]),
    )
    res = ens.analysis(T=298.15)
    assert res["n_conformers"] == 2
    assert res["populations"][0] > res["populations"][1]
    with pytest.raises(ValueError):
        Ensemble(
            atoms=symbols_from_atomnos(atomnos), coords=coords[None]
        ).analysis()


@pytest.mark.operator
def test_entropy_operator_run(rundir):
    # butane anti+gauche rotamers through the driver: populations must favor
    # the lower-energy conformer and the artifact must carry the analysis
    from tests.test_operators import _butane_rotamer_endpoints

    atomnos, frames = _butane_rotamer_endpoints()
    run_input(
        rundir,
        "NOOPT\nentropy> rot.xyz\n",
        {"rot.xyz": (atomnos, frames)},
    )
    data = json.loads((rundir / "rot_entropy.json").read_text())
    assert data["n_conformers"] == 2
    assert np.isclose(sum(data["populations"]), 1.0, atol=1e-6)
    assert data["s_conf_cal_mol_k"] > 0.0
    assert data["weighting"] == "E_el"
    log = (rundir / "firecode_test.log").read_text()
    assert "S_conf" in log and "G_conf" in log


def test_rotamer_degeneracies_groups_methyl_rotation():
    # a 120-degree terminal-methyl rotation of butane is the SAME conformer
    # under the rotamer permutations: grouping must collapse it (g=2) while
    # the gauche rotamer stays distinct
    import jax.numpy as jnp

    from firecode_tpu.ensemble_thermo import rotamer_degeneracies
    from firecode_tpu.graphs import graphize, rotation_mask
    from firecode_tpu.ops.torsion_ops import rotate_dihedral
    from firecode_tpu.sample_molecules import build_alkane

    atomnos, anti = build_alkane(4)
    graph = graphize(atomnos, anti)
    # backbone C0-C1-C2-C3; terminal methyl torsion about C0-C1
    h_on_c0 = next(
        n for n in graph.neighbors(0) if atomnos[n] == 1
    )
    mask = jnp.asarray(rotation_mask(graph, (h_on_c0, 0, 1, 2)))
    methyl_rot = np.asarray(
        rotate_dihedral(
            jnp.asarray(anti), jnp.asarray([h_on_c0, 0, 1, 2]), 120.0, mask
        )
    )
    bb_mask = jnp.asarray(rotation_mask(graph, (0, 1, 2, 3)))
    gauche = np.asarray(
        rotate_dihedral(jnp.asarray(anti), jnp.asarray([0, 1, 2, 3]), 120.0, bb_mask)
    )
    coords = np.stack([anti, methyl_rot, gauche])
    kept, deg, e_group = rotamer_degeneracies(coords, atomnos)
    assert list(kept) == [0, 2]
    assert list(deg) == [2.0, 1.0]
    assert e_group is None  # no energies passed

    # with energies: each group's representative energy is the MINIMUM over
    # its members (cregen represents a group by its lowest conformer), even
    # when the greedy keep-first prune kept the higher-energy member
    kept, deg, e_group = rotamer_degeneracies(
        coords, atomnos, energies=np.array([0.3, 0.1, 1.0]), max_dE=1.0
    )
    assert list(kept) == [0, 2]
    assert np.allclose(e_group, [0.1, 1.0])


@pytest.mark.operator
def test_entropy_operator_grouped(rundir):
    # same ensemble through the driver with entropy(group=1)>
    import jax.numpy as jnp

    from firecode_tpu.graphs import graphize, rotation_mask
    from firecode_tpu.ops.torsion_ops import rotate_dihedral
    from firecode_tpu.sample_molecules import build_alkane

    atomnos, anti = build_alkane(4)
    graph = graphize(atomnos, anti)
    h_on_c0 = next(n for n in graph.neighbors(0) if atomnos[n] == 1)
    mask = jnp.asarray(rotation_mask(graph, (h_on_c0, 0, 1, 2)))
    methyl_rot = np.asarray(
        rotate_dihedral(
            jnp.asarray(anti), jnp.asarray([h_on_c0, 0, 1, 2]), 120.0, mask
        )
    )
    coords = np.stack([anti, methyl_rot])
    run_input(
        rundir,
        "NOOPT\nentropy(group=1)> rot.xyz\n",
        {"rot.xyz": (atomnos, coords)},
    )
    data = json.loads((rundir / "rot_entropy.json").read_text())
    assert data["n_conformers"] == 1
    assert data["degeneracies"] == [2]
    assert data["conformer_indices"] == [0]


@pytest.mark.operator
def test_entropy_operator_qrrho(rundir):
    # qrrho=1: populations over E + G_corr(qRRHO) from batched exact Hessians
    from tests.test_operators import _butane_rotamer_endpoints

    atomnos, frames = _butane_rotamer_endpoints()
    run_input(
        rundir,
        "NOOPT\nentropy(qrrho=1)> rot.xyz\n",
        {"rot.xyz": (atomnos, frames)},
    )
    data = json.loads((rundir / "rot_entropy.json").read_text())
    assert data["weighting"] == "G(qRRHO)"
    assert np.isclose(sum(data["populations"]), 1.0, atol=1e-6)
