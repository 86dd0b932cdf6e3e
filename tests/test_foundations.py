import numpy as np

from firecode_tpu.ensemble import Ensemble
from firecode_tpu.graphs import fragment_ids, graphize, molecule_check, rotation_mask
from firecode_tpu.io.xyz import parse_energy, parse_xyz, write_xyz
from firecode_tpu.pt import atomnos_from_symbols, pt

WATER = np.array(
    [
        [0.0, 0.0, 0.0],
        [0.9572, 0.0, 0.0],
        [-0.2399, 0.9266, 0.0],
    ]
)
WATER_ATOMS = np.array(["O", "H", "H"])

# idealized n-butane (staggered anti), C-C 1.54, C-H 1.09
BUTANE_ATOMS = np.array(["C", "C", "C", "C"] + ["H"] * 10)


def _butane_carbons():
    # zig-zag backbone in the xz plane
    d, ang = 1.54, np.radians(111.0)
    pts = [np.zeros(3)]
    direction = np.array([1.0, 0.0, 0.0])
    up = np.array([np.cos(np.pi - ang), 0.0, np.sin(np.pi - ang)])
    pts.append(pts[-1] + d * direction)
    pts.append(pts[-1] + d * up)
    pts.append(pts[-1] + d * direction)
    return np.stack(pts)


def test_pt_lookups():
    assert pt.number("C") == 6
    assert pt.number("cl") == 17
    assert pt.symbol(1) == "H"
    assert abs(pt.mass("O") - 15.999) < 1e-3
    assert abs(pt.covalent_radius("C") - 0.76) < 1e-6
    np.testing.assert_array_equal(atomnos_from_symbols(["H", "C", "N"]), [1, 6, 7])


def test_xyz_roundtrip(tmp_path):
    path = tmp_path / "w.xyz"
    coords = np.stack([WATER, WATER + 1.0])
    write_xyz(path, WATER_ATOMS, coords, energies=np.array([-76.4, -76.3]))
    atoms, read_coords, comments = parse_xyz(path.read_text())
    assert atoms == ["O", "H", "H"]
    np.testing.assert_allclose(read_coords, coords, atol=1e-7)
    assert parse_energy(comments[0]) == -76.4


def test_ensemble_from_xyz(tmp_path):
    from firecode_tpu.units import EH_TO_KCAL

    path = tmp_path / "w.xyz"
    write_xyz(path, WATER_ATOMS, WATER[None], energies=np.array([-76.4]))
    ens = Ensemble.from_xyz(path, read_energies=True)
    assert len(ens) == 1
    np.testing.assert_array_equal(ens.atomnos, [8, 1, 1])
    # comment-line energies are Hartree; the Ensemble contract is kcal/mol
    # (ADVICE r3: storing raw Eh inflated analysis() gaps ~627x)
    assert np.isclose(ens.energies[0], -76.4 * EH_TO_KCAL)


def test_ensemble_energy_pruning():
    coords = np.zeros((10, 3, 3))
    energies = np.arange(10, dtype=float) * 3.0
    ens = Ensemble(atoms=WATER_ATOMS, coords=coords, energies=energies, logfunction=None)
    ens.energy_pruning(kcal_thr=10.0)
    assert len(ens) == 4  # 0, 3, 6, 9 kcal/mol survive


def test_graphize_water():
    g = graphize(WATER_ATOMS, WATER)
    assert set(g.edges) == {(0, 1), (0, 2)}
    assert g.nodes[0]["atoms"] == "O"


def test_graphize_butane_backbone():
    carbons = _butane_carbons()
    g = graphize(np.array(["C"] * 4), carbons)
    assert set(g.edges) == {(0, 1), (1, 2), (2, 3)}
    mask = rotation_mask(g, (0, 1, 2, 3))
    np.testing.assert_array_equal(mask, [False, False, False, True])
    ids = fragment_ids(g, 4)
    assert len(set(ids)) == 1


def test_molecule_check():
    carbons = _butane_carbons()
    atoms = np.array(["C"] * 4)
    assert molecule_check(atoms, carbons, carbons)
    broken = carbons.copy()
    broken[3] += 10.0
    assert not molecule_check(atoms, carbons, broken)


def test_ensemble_similarity_pruning_smoke(rng):
    from tests.conftest import make_chain_coords, perturb_ensemble

    base = make_chain_coords(8, rng)
    ens_coords = perturb_ensemble(base, 10, scale=0.01, rng=rng)
    atoms = np.array(["C"] * 8)
    ens = Ensemble(atoms=atoms, coords=ens_coords, logfunction=None)
    ens.similarity_pruning(moi=True, rmsd=True)
    assert len(ens) >= 1
    assert len(ens) < 10
