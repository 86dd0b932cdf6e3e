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
