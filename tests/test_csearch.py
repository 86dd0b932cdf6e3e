import numpy as np
import jax.numpy as jnp

from firecode_tpu.csearch import csearch, find_hydrogen_bonds
from firecode_tpu.graphs import graphize
from firecode_tpu.torsions import find_torsions
from tests.molecules import build_alkane


def test_butane_torsion_discovery():
    atomnos, coords = build_alkane(4)
    graph = graphize(atomnos, coords)
    torsions = find_torsions(graph, atomnos, coords)
    # only the central C-C bond is a real (non-dummy) rotor
    assert len(torsions) == 1
    t = torsions[0]
    assert {t.i2, t.i3} == {1, 2}
    assert t.n_fold == 3


def test_butane_csearch_generates_rotamers():
    atomnos, coords = build_alkane(4)
    out = csearch(atomnos, coords, n_out=10, seed=1)
    # anti + two gauche
    assert 2 <= len(out) <= 4
    from firecode_tpu.ops.torsion_ops import measure_dihedrals

    quad = jnp.asarray([[0, 1, 2, 3]])
    angles = sorted(
        round(float(measure_dihedrals(jnp.asarray(c), quad)[0])) % 360 for c in out
    )
    # should include distinct rotamers separated by ~120 degrees
    assert len(set(angles)) == len(angles)


def test_hexane_csearch_more_torsions():
    atomnos, coords = build_alkane(6)
    graph = graphize(atomnos, coords)
    torsions = find_torsions(graph, atomnos, coords)
    assert len(torsions) == 3
    out = csearch(atomnos, coords, n_out=30, seed=2)
    assert len(out) > 3
    # all generated conformers keep the molecular topology (no clashes broke bonds)
    from firecode_tpu.graphs import molecule_check
    from firecode_tpu.pt import symbols_from_atomnos

    atoms = symbols_from_atomnos(atomnos)
    for c in out[:5]:
        assert molecule_check(atoms, coords, c)


def test_csearch_no_torsions_returns_input():
    from tests.test_calculator_opt import WATER, WATER_Z

    out = csearch(WATER_Z, WATER, n_out=5)
    assert out.shape == (1, 3, 3)


def test_hydrogen_bond_detection():
    # water dimer: donor O-H ... O acceptor
    w1 = np.array([[0.0, 0.0, 0.0], [0.96, 0.0, 0.0], [-0.24, 0.93, 0.0]])
    w2 = w1 + np.array([2.8, 0.0, 0.0])
    coords = np.concatenate([w1, w2])
    atomnos = np.array([8, 1, 1, 8, 1, 1], dtype=np.int32)
    graph = graphize(atomnos, coords)
    hbs = find_hydrogen_bonds(atomnos, coords, graph)
    assert (1, 3) in hbs  # H of water 1 bonded toward O of water 2
