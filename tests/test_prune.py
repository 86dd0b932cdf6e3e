import numpy as np
import jax.numpy as jnp
import pytest

from firecode_tpu.prune import prune_by_moi, prune_by_rmsd, prune_by_rmsd_rot_corr, prune_by_tfd
from firecode_tpu.prune.oracle import (
    np_prune_by_moi,
    np_prune_by_rmsd,
    np_prune_by_rmsd_rot_corr,
    np_prune_by_tfd,
)
from tests.conftest import make_chain_coords, perturb_ensemble


def _ensemble_with_duplicates(rng, n_atoms=14, n_groups=6, group_size=5, scale=0.05):
    """Clusters of near-duplicates: members differ by tiny jitter + rigid motion."""
    groups = []
    for _ in range(n_groups):
        base = make_chain_coords(n_atoms, rng)
        groups.append(perturb_ensemble(base, group_size, scale=scale, rng=rng))
    ens = np.concatenate(groups)
    order = rng.permutation(len(ens))
    return ens[order]


def test_prune_by_rmsd_matches_oracle(rng):
    ens = _ensemble_with_duplicates(rng)
    got = prune_by_rmsd(ens, rmsd_thr=0.5, block=8)
    want = np_prune_by_rmsd(ens, rmsd_thr=0.5)
    np.testing.assert_array_equal(got, want)
    assert got.sum() < len(ens)  # something was actually pruned


def test_prune_by_rmsd_blocksize_invariance(rng):
    ens = _ensemble_with_duplicates(rng, n_groups=4, group_size=4)
    masks = [prune_by_rmsd(ens, rmsd_thr=0.5, block=b) for b in (2, 4, 8, 16)]
    for m in masks[1:]:
        np.testing.assert_array_equal(masks[0], m)


def test_prune_by_rmsd_energy_gating(rng):
    ens = _ensemble_with_duplicates(rng, n_groups=3, group_size=4)
    energies = rng.normal(size=len(ens)) * 5.0
    got = prune_by_rmsd(ens, energies=energies, max_dE=1.0, block=8)
    want = np_prune_by_rmsd(ens, energies=energies, max_dE=1.0)
    np.testing.assert_array_equal(got, want)
    # gating must keep more than no gating
    assert got.sum() >= prune_by_rmsd(ens, block=8).sum()


def test_prune_by_moi_matches_oracle(rng):
    ens = _ensemble_with_duplicates(rng, n_groups=5, group_size=4, scale=0.01)
    atomnos = rng.integers(1, 18, size=ens.shape[1])
    got = prune_by_moi(ens, atomnos, block=8)
    want = np_prune_by_moi(ens, atomnos)
    np.testing.assert_array_equal(got, want)


def test_prune_by_tfd_matches_oracle(rng):
    base = make_chain_coords(12, rng)
    ens = perturb_ensemble(base, 20, scale=0.02, rng=rng)
    quads = np.array([[0, 1, 2, 3], [2, 3, 4, 5], [5, 6, 7, 8], [8, 9, 10, 11]])
    got = prune_by_tfd(ens, quads, thresh=10.0, block=4)
    want = np_prune_by_tfd(ens, quads, thresh=10.0)
    np.testing.assert_array_equal(got, want)
    assert got.sum() < 20


def _methyl_like(rng):
    """A 'methyl'-bearing toy molecule with exact C3 symmetry of the H atoms.

    atoms: C0 (apex), C1 (methyl C), H2 H3 H4 arranged 3-fold about the C0-C1
    axis, plus a tail atom on C0 to break other symmetries.
    """
    c0 = np.zeros(3)
    c1 = np.array([0.0, 0.0, 1.54])
    hs = []
    for k in range(3):
        ang = 2 * np.pi * k / 3
        hs.append(c1 + np.array([np.cos(ang), np.sin(ang), 0.4]) * np.array([1.0, 1.0, 1.0]))
    tail = np.array([0.0, 1.0, -1.0])
    coords = np.stack([c0, c1, *hs, tail])
    atomnos = np.array([6, 6, 1, 1, 1, 8], dtype=np.int32)
    return atomnos, coords


def test_rotamer_permutations_found():
    from firecode_tpu.torsions import rotamer_permutations

    atomnos, coords = _methyl_like(np.random.default_rng(0))
    perms = rotamer_permutations(atomnos, coords)
    assert len(perms) == 2  # the two non-identity methyl rotations
    for p in perms:
        # permutes only hydrogens 2, 3, 4
        assert set(np.where(p != np.arange(6))[0]) <= {2, 3, 4}


def test_prune_rot_corr_matches_oracle(rng):
    from firecode_tpu.torsions import rotamer_permutations

    atomnos, base = _methyl_like(rng)
    # build rotamer duplicates: same structure with H labels cyclically permuted
    perms = rotamer_permutations(atomnos, base)
    assert len(perms) > 0
    ens = [base]
    for p in perms:
        ens.append(base[p])
    ens.append(base + np.array([0.0, 0.0, 3.0]) * 0)  # exact duplicate
    dissimilar = base.copy()
    dissimilar[-1] += np.array([3.0, 3.0, 3.0])
    ens.append(dissimilar)
    ens = np.stack(ens)

    got = prune_by_rmsd_rot_corr(ens, atomnos, permutations=perms, rmsd_thr=0.3, block=2)
    want = np_prune_by_rmsd_rot_corr(ens, perms, rmsd_thr=0.3)
    np.testing.assert_array_equal(got, want)
    # rotamer copies must be pruned, the genuinely different structure kept
    assert got.tolist() == [True, False, False, False, True]

    # plain RMSD prune must NOT consider rotamer copies duplicates
    plain = prune_by_rmsd(ens, rmsd_thr=0.3, block=2)
    assert plain.sum() > got.sum()


def test_prune_trivial_sizes():
    ens = np.zeros((1, 5, 3))
    assert prune_by_rmsd(ens).tolist() == [True]
    ens0 = np.zeros((0, 5, 3))
    assert prune_by_rmsd(ens0).tolist() == []


def test_prune_by_rmsd_with_atom_mask(rng):
    """Padded atoms (mask False) must not affect keep decisions."""
    ens = _ensemble_with_duplicates(rng, n_atoms=10, n_groups=4, group_size=4)
    # pad with 4 garbage atoms per structure
    garbage = rng.normal(size=(len(ens), 4, 3)) * 50
    padded = np.concatenate([ens, garbage], axis=1)
    mask = np.array([True] * 10 + [False] * 4)
    got = prune_by_rmsd(padded, atom_mask=mask, block=8)
    want = prune_by_rmsd(ens, block=8)
    np.testing.assert_array_equal(got, want)
    # without the mask the garbage atoms dominate and change the result
    unmasked = prune_by_rmsd(padded, block=8)
    assert unmasked.sum() != want.sum() or not np.array_equal(unmasked, want)


def _grid_keep(ens, atomnos, energies=None, max_dE=1.0, rel_tol=0.01, r_chunk=8):
    """Drive the banded grid MOI engine directly (the wrapper gates it on
    size); small r_chunk so tiny test ensembles span several chunks."""
    from firecode_tpu.ops.inertia import log_moments_chunked
    from firecode_tpu.prune.cascade import (
        _moi_grid_stats,
        _prune_moi_grid_device,
    )
    from firecode_tpu.pt import MASSES

    coords = jnp.asarray(ens)
    masses = jnp.asarray(MASSES[np.asarray(atomnos)], coords.dtype)
    has_e = energies is not None
    e = jnp.asarray(
        energies if has_e else np.zeros(len(ens)), dtype=coords.dtype
    )
    rel = jnp.asarray(rel_tol, coords.dtype)
    lm = log_moments_chunked(coords, masses)
    max_run, _, spread = _moi_grid_stats(lm, rel, r_chunk=r_chunk)
    w_need = max(int(spread) + int(max_run), 1)
    w = max(8, -(-w_need // 8) * 8)
    return np.asarray(
        _prune_moi_grid_device(
            lm, e, rel, jnp.asarray(max_dE, coords.dtype),
            w, r_chunk, has_e,
        )
    )


def test_moi_grid_engine_matches_oracle(rng):
    ens = _ensemble_with_duplicates(rng, n_groups=6, group_size=5, scale=0.01)
    atomnos = rng.integers(1, 18, size=ens.shape[1])
    got = _grid_keep(ens, atomnos)
    want = np_prune_by_moi(ens, atomnos)
    np.testing.assert_array_equal(got, want)
    assert got.sum() < len(ens)


def test_moi_grid_engine_row_chunked(rng):
    """Chunked banded sweeps (the 1e7-scale memory path) must give the same
    keep lists at every chunk size, including when the ensemble size is not
    a multiple of the chunk (sentinel-padded lanes)."""
    ens = _ensemble_with_duplicates(rng, n_groups=7, group_size=5, scale=0.01)
    assert len(ens) == 35
    want = np_prune_by_moi(ens, np.full(ens.shape[1], 6))
    atomnos = np.full(ens.shape[1], 6)
    for chunk in (8, 16, 35, 64):
        got = _grid_keep(ens, atomnos, r_chunk=chunk)
        np.testing.assert_array_equal(got, want, err_msg=f"r_chunk={chunk}")


def test_log_moments_chunked_matches_unchunked(rng):
    from firecode_tpu.ops.inertia import log_moments, log_moments_chunked
    from firecode_tpu.pt import MASSES

    coords = jnp.asarray(rng.normal(size=(37, 8, 3)).astype(np.float32))
    masses = jnp.asarray(MASSES[rng.integers(1, 18, size=8)], jnp.float32)
    want = np.asarray(log_moments(coords, masses))
    for chunk in (5, 16, 37, 50):
        got = np.asarray(log_moments_chunked(coords, masses, chunk=chunk))
        np.testing.assert_allclose(got, want, rtol=1e-6, err_msg=f"chunk={chunk}")


def test_moi_grid_engine_energy_gated(rng):
    ens = _ensemble_with_duplicates(rng, n_groups=4, group_size=6, scale=0.01)
    atomnos = rng.integers(1, 18, size=ens.shape[1])
    energies = rng.normal(size=len(ens)) * 3.0
    got = _grid_keep(ens, atomnos, energies=energies, max_dE=1.0)
    want = np_prune_by_moi(ens, atomnos, energies=energies, max_dE=1.0)
    np.testing.assert_array_equal(got, want)
    # gating keeps at least as many as ungated
    assert got.sum() >= _grid_keep(ens, atomnos).sum()


def test_moi_grid_engine_matches_dense_device(rng):
    ens = _ensemble_with_duplicates(rng, n_groups=8, group_size=4, scale=0.02)
    atomnos = rng.integers(1, 18, size=ens.shape[1])
    got = _grid_keep(ens, atomnos)
    dense = prune_by_moi(ens, atomnos, block=8)
    np.testing.assert_array_equal(got, dense)


def test_moi_grid_degenerate_single_cell(rng):
    # all structures identical: one cell holds everything; the grid engine
    # itself must still resolve exactly (keep only the first)
    base = make_chain_coords(10, rng)
    ens = np.stack([base] * 12)
    atomnos = rng.integers(1, 18, size=10)
    got = _grid_keep(ens, atomnos)
    want = np_prune_by_moi(ens, atomnos)
    np.testing.assert_array_equal(got, want)
    assert got.sum() == 1 and got[0]


def test_moi_grid_wrapper_dispatch(rng, monkeypatch):
    # force the wrapper's grid path at tiny sizes and check it agrees with
    # the dense path byte-for-byte
    import firecode_tpu.prune.cascade as cascade

    ens = _ensemble_with_duplicates(rng, n_groups=5, group_size=5, scale=0.01)
    atomnos = rng.integers(1, 18, size=ens.shape[1])
    dense = prune_by_moi(ens, atomnos, block=8)
    monkeypatch.setattr(cascade, "_GRID_MIN_B", 1)
    grid = prune_by_moi(ens, atomnos, block=8)
    np.testing.assert_array_equal(dense, grid)
