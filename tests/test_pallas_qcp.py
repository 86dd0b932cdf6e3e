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
