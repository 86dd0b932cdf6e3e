import numpy as np
import pytest
from types import SimpleNamespace

from firecode_tpu.embed import Hypermolecule
from firecode_tpu.embed.embeds import cyclical_embed, polygonize, string_embed
from firecode_tpu.errors import TriangleError

ETHENE_Z = np.array([6, 6, 1, 1, 1, 1], dtype=np.int32)
ETHENE = np.array(
    [
        [0.0, 0.0, 0.0],
        [1.34, 0.0, 0.0],
        [-0.56, 0.92, 0.0],
        [-0.56, -0.92, 0.0],
        [1.90, 0.92, 0.0],
        [1.90, -0.92, 0.0],
    ]
)

HF_Z = np.array([1, 9], dtype=np.int32)
HF = np.array([[0.0, 0.0, 0.0], [0.92, 0.0, 0.0]])

NH3_Z = np.array([7, 1, 1, 1], dtype=np.int32)
NH3 = np.array(
    [
        [0.0, 0.0, 0.0],
        [0.94, 0.38, 0.0],
        [-0.74, 0.62, 0.33],
        [-0.19, -0.93, 0.33],
    ]
)


def _options(**kw):
    defaults = dict(clash_thresh=1.2, suprafacial=False, simpleorbitals=False)
    defaults.update(kw)
    return SimpleNamespace(**defaults)


def _embedder(mols, systematic_angles):
    offsets = 0
    for mol in mols:
        mol.compute_orbitals()
        mol.set_pivots()
        mol.set_cumnums(offsets)
        offsets += mol.n_atoms
    return SimpleNamespace(
        objects=mols,
        ids=np.array([m.n_atoms for m in mols]),
        options=_options(),
        systematic_angles=systematic_angles,
        pairings_table={},
        internal_constraints=np.zeros((0, 2), dtype=int),
        log=lambda s: None,
        constrained_indices=None,
    )


def test_orbital_kinds():
    hf = Hypermolecule(atomnos=HF_Z, coords=HF, reactive_indices=[1], name="hf")
    hf.compute_orbitals()
    atom = hf.reactive_atoms[0][1]
    assert atom.kind == "single"
    assert atom.n_lobes == 1
    # lobe points away from H, along the bond axis
    assert atom.orb_vecs[0] @ np.array([1.0, 0, 0]) > 0.99

    eth = Hypermolecule(atomnos=ETHENE_Z, coords=ETHENE, reactive_indices=[0, 1], name="eth")
    eth.compute_orbitals()
    for idx in (0, 1):
        atom = eth.reactive_atoms[0][idx]
        assert atom.kind == "sp2"
        assert atom.n_lobes == 2
        # p lobes perpendicular to the molecular plane
        assert abs(atom.orb_vecs[0][2]) > 0.99


def test_pivots_ethene():
    eth = Hypermolecule(atomnos=ETHENE_Z, coords=ETHENE, reactive_indices=[0, 1], name="eth")
    eth.compute_orbitals()
    eth.set_pivots()
    assert len(eth.pivots[0]) == 4  # 2 lobes x 2 lobes
    eth.set_pivots(suprafacial=True)
    assert len(eth.pivots[0]) == 2  # suprafacial pair kept
    # suprafacial pivots are the short (same-face) ones
    norms = [p.norm for p in eth.pivots[0]]
    assert all(abs(n - 1.34) < 0.05 for n in norms)


def test_polygonize_shapes():
    digons = polygonize(np.array([1.5, 1.6]))
    assert digons.shape == (2, 2, 2, 3)
    triangles = polygonize(np.array([1.5, 1.6, 1.7]))
    assert triangles.shape == (8, 3, 2, 3)
    with pytest.raises(TriangleError):
        polygonize(np.array([1.0, 1.0, 5.0]))


def test_string_embed_hf_nh3():
    hf = Hypermolecule(atomnos=HF_Z, coords=HF, reactive_indices=[0], name="hf")  # H reactive
    nh3 = Hypermolecule(atomnos=NH3_Z, coords=NH3, reactive_indices=[0], name="nh3")
    angles = [n * 360 / 12 for n in range(12)]
    emb = _embedder([hf, nh3], angles)
    poses = string_embed(emb)
    assert poses.shape[1:] == (6, 3)
    assert len(poses) >= 1
    assert emb.constrained_indices.shape[1:] == (1, 2)
    # constrained pair: H of HF (cum 0) and N of NH3 (cum 2)
    assert tuple(emb.constrained_indices[0][0]) == (0, 2)
    # reactive atoms should be at roughly the sum of orb_dims
    for pose in poses:
        d = np.linalg.norm(pose[0] - pose[2])
        assert 1.0 < d < 3.0


def test_cyclical_embed_two_ethenes():
    m1 = Hypermolecule(atomnos=ETHENE_Z, coords=ETHENE, reactive_indices=[0, 1], name="e1")
    m2 = Hypermolecule(atomnos=ETHENE_Z, coords=ETHENE, reactive_indices=[0, 1], name="e2")
    # 3x3 systematic angle grid over +-90 degrees
    steps = 2
    grid = np.stack(np.meshgrid(*[np.arange(steps + 1)] * 2, indexing="ij"), -1).reshape(-1, 2)
    angles = grid * 2 * 90 / steps - 90
    emb = _embedder([m1, m2], list(angles))
    poses = cyclical_embed(emb)
    assert poses.shape[1:] == (12, 3)
    assert len(poses) > 1
    assert len(emb.constrained_indices) == len(poses)
    # each pose pairs C atoms across the two molecules
    for ids in emb.constrained_indices[:3]:
        for i1, i2 in ids:
            assert i1 < 6 <= i2
    # molecules not compenetrated: inter-fragment min distance above clash_thr
    for pose in poses[:5]:
        from scipy.spatial.distance import cdist

        d = cdist(pose[:6], pose[6:])
        assert d.min() > 1.2
