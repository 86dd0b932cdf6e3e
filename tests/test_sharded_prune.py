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


def test_sharded_moi_tfd_rot_corr_match_single_device(rng):
    from firecode_tpu.parallel.sharded_prune import (
        prune_by_moi_sharded,
        prune_by_rmsd_rot_corr_sharded,
        prune_by_tfd_sharded,
    )
    from firecode_tpu.prune import prune_by_moi, prune_by_rmsd_rot_corr, prune_by_tfd
    from firecode_tpu.sample_molecules import build_alkane

    atomnos, base = build_alkane(5)
    ens = np.stack(
        [base + rng.normal(scale=0.35, size=base.shape) for _ in range(37)]
    )
    energies = rng.normal(size=37)
    mesh = ensemble_mesh(8)

    np.testing.assert_array_equal(
        prune_by_moi_sharded(ens, atomnos, block=4, mesh=mesh, energies=energies),
        prune_by_moi(ens, atomnos, energies=energies, block=4),
    )
    quads = np.array([[0, 1, 2, 3], [1, 2, 3, 4]], np.int32)
    np.testing.assert_array_equal(
        prune_by_tfd_sharded(ens, quads, block=4, mesh=mesh),
        prune_by_tfd(ens, quads, block=4),
    )
    np.testing.assert_array_equal(
        prune_by_rmsd_rot_corr_sharded(ens, atomnos, block=4, mesh=mesh),
        prune_by_rmsd_rot_corr(ens, atomnos, block=4),
    )


def test_public_prune_mesh_dispatch(rng):
    """prune_by_rmsd(mesh=...) routes through the sharded engine, same mask."""
    ens = _duplicate_heavy_ensemble(rng, n_groups=4, group_size=4)
    mesh = ensemble_mesh(8)
    np.testing.assert_array_equal(
        prune_by_rmsd(ens, mesh=mesh), prune_by_rmsd(ens)
    )


def test_scramble_check_batch_matches_scalar(rng):
    from firecode_tpu.graphs import graphize, scramble_check, scramble_check_batch
    from firecode_tpu.sample_molecules import build_alkane

    atomnos, base = build_alkane(4)
    graph = graphize(atomnos, base)
    # mix of intact, mildly perturbed, and scrambled structures
    ens = np.stack(
        [base + rng.normal(scale=s, size=base.shape) for s in (0.01, 0.05, 0.8, 1.5)]
    )
    excluded = [0, 1]
    got = scramble_check_batch(atomnos, ens, excluded, [graph], max_newbonds=0)
    want = np.array(
        [
            scramble_check(atomnos, c, excluded, [graph], max_newbonds=0)
            for c in ens
        ]
    )
    np.testing.assert_array_equal(got, want)
    assert got[0] and not got.all()
