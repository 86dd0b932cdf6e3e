import numpy as np
import jax.numpy as jnp

from firecode_tpu.ops.pallas_qcp import pairwise_rmsd_pallas
from firecode_tpu.ops.rmsd import pairwise_rmsd
from tests.conftest import make_chain_coords, perturb_ensemble


def test_pallas_qcp_matches_jnp_path(rng):
    base = make_chain_coords(14, rng)
    ens = perturb_ensemble(base, 20, scale=0.3, rng=rng).astype(np.float32)
    got = np.asarray(pairwise_rmsd_pallas(ens, ens, interpret=True))
    want = np.asarray(pairwise_rmsd(jnp.asarray(ens), jnp.asarray(ens)))
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_pallas_qcp_rectangular(rng):
    base = make_chain_coords(10, rng)
    a = perturb_ensemble(base, 7, scale=0.2, rng=rng).astype(np.float32)
    b = perturb_ensemble(base, 13, scale=0.2, rng=rng).astype(np.float32)
    got = np.asarray(pairwise_rmsd_pallas(a, b, interpret=True))
    assert got.shape == (7, 13)
    want = np.asarray(pairwise_rmsd(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_pallas_qcp_identical_structures(rng):
    base = make_chain_coords(12, rng).astype(np.float32)
    ens = np.stack([base, base])
    got = np.asarray(pairwise_rmsd_pallas(ens, ens, interpret=True))
    assert got[0, 1] < 1e-2


def test_cascade_pallas_keep_list_matches_jnp(rng):
    """The production integration: prune_by_rmsd with the fused Pallas tile
    must reproduce the jnp path's keep-list (VERDICT round-1 item 4)."""
    from firecode_tpu.prune import prune_by_rmsd

    base = make_chain_coords(12, rng)
    # well-separated clusters so f32-vs-f64 rounding cannot flip a decision
    ens = perturb_ensemble(base, 40, scale=0.02, rng=rng)
    ens[20:] += 1.5 * np.sign(rng.normal(size=(20, 12, 3)))
    keep_jnp = prune_by_rmsd(ens.astype(np.float32), rmsd_thr=0.5, block=16, use_pallas=False)
    keep_pls = prune_by_rmsd(ens.astype(np.float32), rmsd_thr=0.5, block=16, use_pallas=True)
    np.testing.assert_array_equal(keep_jnp, keep_pls)
    assert keep_jnp.sum() < 40  # it actually pruned something


def test_pallas_quat_tile_matches_jnp_maxdev(rng):
    """The quaternion-emitting kernel (VERDICT r2 #5): maxdev reconstructed
    from the emitted quaternion must match the jnp rotation-recovery path."""
    from firecode_tpu.ops.algebra import quaternion_to_matrix
    from firecode_tpu.ops.pallas_qcp import pallas_rmsd_quat_tile
    from firecode_tpu.ops.rmsd import center_coords, pairwise_rmsd_maxdev
    from firecode_tpu.prune.cascade import _maxdev_from_rotation

    base = make_chain_coords(11, rng)
    ens = jnp.asarray(perturb_ensemble(base, 9, scale=0.25, rng=rng).astype(np.float32))
    ac, ga, wsum = center_coords(ens)
    rmsd, quat = pallas_rmsd_quat_tile(ac, ga, ac, ga, wsum, thr=None, interpret=True)
    rot = jnp.swapaxes(quaternion_to_matrix(quat), -1, -2)
    got_dev = np.asarray(_maxdev_from_rotation(ac, ac, rot))
    want_rmsd, want_dev = pairwise_rmsd_maxdev(ens, ens)
    np.testing.assert_allclose(np.asarray(rmsd), np.asarray(want_rmsd), atol=2e-3)
    np.testing.assert_allclose(got_dev, np.asarray(want_dev), atol=5e-3)


def test_pallas_quat_tile_thr_gating(rng):
    """Tiles with no rmsd < thr pair return identity quaternions (the
    adjugate epilogue is skipped); rmsd output is unaffected."""
    from firecode_tpu.ops.pallas_qcp import pallas_rmsd_quat_tile
    from firecode_tpu.ops.rmsd import center_coords

    base = make_chain_coords(10, rng)
    ens = jnp.asarray(perturb_ensemble(base, 6, scale=2.0, rng=rng).astype(np.float32))
    ac, ga, wsum = center_coords(ens)
    rmsd, quat = pallas_rmsd_quat_tile(ac, ga, ac, ga, wsum, thr=1e-6, interpret=True)
    # no off-diagonal pair is that close, but the diagonal is: the gate fires,
    # so real quaternions are emitted. Force a truly empty tile instead:
    other = jnp.asarray(
        perturb_ensemble(base + 50.0, 6, scale=2.0, rng=rng).astype(np.float32)
    )
    bc, gb, _ = center_coords(other)
    rmsd2, quat2 = pallas_rmsd_quat_tile(ac, ga, bc, gb, wsum, thr=1e-6, interpret=True)
    assert np.all(np.asarray(rmsd2) > 1e-3)
    np.testing.assert_allclose(
        np.asarray(quat2), np.broadcast_to([1.0, 0, 0, 0], quat2.shape), atol=1e-6
    )


def test_rot_corr_pallas_keep_list_matches_jnp(rng):
    from firecode_tpu.prune import prune_by_rmsd_rot_corr

    base = make_chain_coords(12, rng)
    ens = perturb_ensemble(base, 24, scale=0.02, rng=rng)
    ens[12:] += 1.5 * np.sign(rng.normal(size=(12, 12, 3)))
    perms = np.stack([np.roll(np.arange(12), 3), np.roll(np.arange(12), 6)])
    keep_jnp = prune_by_rmsd_rot_corr(
        ens.astype(np.float32), permutations=perms, rmsd_thr=0.5, block=8,
        use_pallas=False,
    )
    keep_pls = prune_by_rmsd_rot_corr(
        ens.astype(np.float32), permutations=perms, rmsd_thr=0.5, block=8,
        use_pallas=True,
    )
    np.testing.assert_array_equal(keep_jnp, keep_pls)


def test_cascade_pallas_with_maxdev_and_energies(rng):
    from firecode_tpu.prune import prune_by_rmsd

    base = make_chain_coords(10, rng)
    ens = perturb_ensemble(base, 24, scale=0.05, rng=rng)
    energies = rng.normal(size=24)
    keep_jnp = prune_by_rmsd(
        ens.astype(np.float32), rmsd_thr=0.4, energies=energies, use_maxdev=True,
        block=8, use_pallas=False,
    )
    keep_pls = prune_by_rmsd(
        ens.astype(np.float32), rmsd_thr=0.4, energies=energies, use_maxdev=True,
        block=8, use_pallas=True,
    )
    np.testing.assert_array_equal(keep_jnp, keep_pls)
