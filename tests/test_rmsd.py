import numpy as np
import jax.numpy as jnp

from firecode_tpu.ops.rmsd import (
    kabsch_align,
    pairwise_rmsd,
    pairwise_rmsd_maxdev,
    rmsd_and_max,
)
from firecode_tpu.prune.oracle import np_rmsd_and_max
from tests.conftest import make_chain_coords, perturb_ensemble


def test_rmsd_identical_structures(rng):
    base = make_chain_coords(20, rng)
    r, m = rmsd_and_max(jnp.asarray(base), jnp.asarray(base))
    assert float(r) < 1e-6
    assert float(m) < 1e-5


def test_rmsd_rotated_copy_is_zero(rng):
    from scipy.spatial.transform import Rotation

    base = make_chain_coords(25, rng)
    rot = Rotation.random(random_state=3).as_matrix()
    moved = base @ rot.T + np.array([5.0, -2.0, 1.0])
    r, m = rmsd_and_max(jnp.asarray(base), jnp.asarray(moved))
    assert float(r) < 1e-6
    assert float(m) < 1e-5


def test_pairwise_rmsd_matches_oracle(rng):
    base = make_chain_coords(15, rng)
    ens = perturb_ensemble(base, 12, scale=0.3, rng=rng)
    got = np.asarray(pairwise_rmsd(jnp.asarray(ens), jnp.asarray(ens)))
    for i in range(12):
        for j in range(12):
            want, _ = np_rmsd_and_max(ens[i], ens[j])
            assert abs(got[i, j] - want) < 1e-6, (i, j, got[i, j], want)


def test_pairwise_maxdev_matches_oracle(rng):
    base = make_chain_coords(10, rng)
    ens = perturb_ensemble(base, 8, scale=0.25, rng=rng)
    rmsd, maxdev = pairwise_rmsd_maxdev(jnp.asarray(ens), jnp.asarray(ens))
    rmsd, maxdev = np.asarray(rmsd), np.asarray(maxdev)
    for i in range(8):
        for j in range(8):
            want_r, want_m = np_rmsd_and_max(ens[i], ens[j])
            assert abs(rmsd[i, j] - want_r) < 1e-6
            assert abs(maxdev[i, j] - want_m) < 1e-5, (i, j, maxdev[i, j], want_m)


def test_weighted_rmsd_ignores_masked_atoms(rng):
    base = make_chain_coords(12, rng)
    other = base.copy()
    other[-2:] += 100.0  # garbage in padded lanes
    w = np.ones(12)
    w[-2:] = 0.0
    r = pairwise_rmsd(jnp.asarray(base[None]), jnp.asarray(other[None]), weights=jnp.asarray(w))
    assert float(r[0, 0]) < 1e-6


def test_kabsch_align(rng):
    from scipy.spatial.transform import Rotation

    base = make_chain_coords(18, rng)
    ens = np.stack([base @ Rotation.random(random_state=s).as_matrix().T + s for s in range(5)])
    aligned = np.asarray(kabsch_align(jnp.asarray(ens), jnp.asarray(base)))
    centered = base - base.mean(axis=0)
    for b in range(5):
        np.testing.assert_allclose(aligned[b], centered, atol=1e-7)
