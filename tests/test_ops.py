import numpy as np
import jax.numpy as jnp
from scipy.spatial.distance import cdist

from firecode_tpu.ops.clash import compenetration_ok, count_clashes, torsion_comp_ok
from firecode_tpu.ops.inertia import eigvalsh3x3, inertia_moments
from firecode_tpu.ops.torsion_ops import measure_dihedrals, rotate_dihedral
from firecode_tpu.prune.oracle import np_inertia_moments
from tests.conftest import make_chain_coords


def test_eigvalsh3x3_matches_numpy(rng):
    mats = rng.normal(size=(30, 3, 3))
    mats = mats + np.swapaxes(mats, -1, -2)
    got = np.asarray(eigvalsh3x3(jnp.asarray(mats)))
    want = np.linalg.eigvalsh(mats)
    np.testing.assert_allclose(got, want, atol=1e-8)


def test_inertia_moments_match_oracle(rng):
    coords = make_chain_coords(12, rng)
    atomnos = rng.integers(1, 18, size=12)
    from firecode_tpu.pt import MASSES

    got = np.asarray(inertia_moments(jnp.asarray(coords[None]), jnp.asarray(MASSES[atomnos])))
    want = np_inertia_moments(coords, atomnos)
    np.testing.assert_allclose(got[0], want, rtol=1e-6)


def test_count_clashes_matches_cdist(rng):
    coords = rng.normal(size=(20, 3)) * 1.0
    got = int(count_clashes(jnp.asarray(coords), thr=0.9))
    d = cdist(coords, coords)
    want = int(np.count_nonzero((d < 0.9) & (d > 0)))
    assert got == want


def test_compenetration(rng):
    # two fragments far apart -> ok; overlapped -> not ok
    frag1 = make_chain_coords(8, rng)
    frag2 = frag1 + np.array([50.0, 0, 0])
    coords = np.concatenate([frag1, frag2])
    ids = np.array([0] * 8 + [1] * 8, dtype=np.int32)
    assert bool(compenetration_ok(jnp.asarray(coords), jnp.asarray(ids)))
    coords_bad = np.concatenate([frag1, frag1 + 0.1])
    assert not bool(compenetration_ok(jnp.asarray(coords_bad), jnp.asarray(ids)))


def test_rotate_dihedral_sets_angle(rng):
    # simple 4-atom chain: rotating the last atom about the central bond
    coords = np.array(
        [
            [1.0, 1.0, 0.0],
            [1.0, 0.0, 0.0],
            [0.0, 0.0, 0.0],
            [-0.5, -1.0, 0.3],
        ]
    )
    quad = jnp.array([0, 1, 2, 3])
    mask = jnp.array([False, False, False, True])
    before = float(measure_dihedrals(jnp.asarray(coords), quad[None])[0])
    for angle in (10.0, 60.0, -120.0, 240.0):
        out = rotate_dihedral(jnp.asarray(coords), quad, angle, mask)
        after = float(measure_dihedrals(out, quad[None])[0])
        delta = (after - before - angle) % 360.0
        assert min(delta, 360.0 - delta) < 1e-6, (angle, before, after)
        # non-moving atoms unchanged
        np.testing.assert_allclose(np.asarray(out)[:3], coords[:3], atol=1e-12)


def test_rotate_dihedral_batched(rng):
    coords = make_chain_coords(10, rng)
    quad = jnp.array([2, 3, 4, 5])
    mask = jnp.array([False] * 4 + [True] * 6)
    angles = jnp.asarray(np.array([0.0, 30.0, 90.0, 180.0]))
    batched = rotate_dihedral(jnp.asarray(np.broadcast_to(coords, (4, 10, 3))), quad, angles, mask)
    for k, a in enumerate([0.0, 30.0, 90.0, 180.0]):
        single = rotate_dihedral(jnp.asarray(coords), quad, a, mask)
        np.testing.assert_allclose(np.asarray(batched)[k], np.asarray(single), atol=1e-9)


def test_torsion_comp_check(rng):
    coords = make_chain_coords(10, rng)
    moving = jnp.array([False] * 5 + [True] * 5)
    static = jnp.array([True] * 4 + [False] * 6)
    ok = bool(torsion_comp_ok(jnp.asarray(coords), moving, static, thr=0.1))
    assert ok  # chain steps are 1.5 A, nothing within 0.1


def test_moi_align(rng):
    """Rotated copies align back onto the reference principal frame."""
    from scipy.spatial.transform import Rotation

    from firecode_tpu.ops.inertia import moi_align
    from firecode_tpu.pt import MASSES

    base = make_chain_coords(9, rng)
    atomnos = rng.integers(1, 10, size=9)
    masses = MASSES[atomnos]
    ens = np.stack(
        [base @ Rotation.random(random_state=s).as_matrix().T + s for s in range(4)]
    )
    aligned = np.asarray(moi_align(jnp.asarray(ens), jnp.asarray(masses)))
    # all frames should coincide after principal-axes alignment (up to the
    # alignment's inherent axis-sign convention, fixed against frame 0)
    for b in range(1, 4):
        assert np.abs(aligned[b] - aligned[0]).max() < 1e-5
