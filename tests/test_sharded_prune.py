import numpy as np

from firecode_tpu.parallel import ensemble_mesh
from firecode_tpu.parallel.sharded_prune import prune_by_rmsd_sharded
from firecode_tpu.prune import prune_by_rmsd
from tests.conftest import make_chain_coords, perturb_ensemble


def _duplicate_heavy_ensemble(rng, n_groups=10, group_size=7, n_atoms=12):
    groups = [
        perturb_ensemble(make_chain_coords(n_atoms, rng), group_size, 0.04, rng)
        for _ in range(n_groups)
    ]
    ens = np.concatenate(groups)
    return ens[rng.permutation(len(ens))]


def test_sharded_prune_matches_single_device(rng):
    ens = _duplicate_heavy_ensemble(rng)
    mesh = ensemble_mesh(8)
    got = prune_by_rmsd_sharded(ens, rmsd_thr=0.5, block=4, mesh=mesh)
    want = prune_by_rmsd(ens, rmsd_thr=0.5, block=4)
    np.testing.assert_array_equal(got, want)
    assert got.sum() < len(ens)


def test_sharded_prune_with_energies(rng):
    ens = _duplicate_heavy_ensemble(rng, n_groups=6, group_size=5)
    energies = rng.normal(size=len(ens)) * 3.0
    mesh = ensemble_mesh(8)
    got = prune_by_rmsd_sharded(ens, energies=energies, block=2, mesh=mesh)
    want = prune_by_rmsd(ens, energies=energies, block=2)
    np.testing.assert_array_equal(got, want)


def test_sharded_prune_device_count_invariance(rng):
    ens = _duplicate_heavy_ensemble(rng, n_groups=5, group_size=4)
    masks = [
        prune_by_rmsd_sharded(ens, block=2, mesh=ensemble_mesh(d)) for d in (1, 2, 4, 8)
    ]
    for m in masks[1:]:
        np.testing.assert_array_equal(masks[0], m)
