"""Mixed-size (bucketed) batching end-to-end — VERDICT r2 item 7.

One batched device program over DIFFERENT molecules padded to a common atom
count must reproduce the per-molecule runs exactly: stacked LiteFF energies,
one batched FIRE optimization, and mask-aware pruning.
"""

import numpy as np
import jax.numpy as jnp

from firecode_tpu.calculators.forcefield import (
    LiteFF,
    StackedLiteFF,
    pad_systems,
)
from firecode_tpu.opt.fire import optimize_batch
from firecode_tpu.sample_molecules import build_alkane, build_ethanol


def _systems():
    z1, x1 = build_alkane(2)  # ethane, 8 atoms
    z2, x2 = build_ethanol()  # 9 atoms
    z3, x3 = build_alkane(4)  # butane, 14 atoms
    return [(np.asarray(z1), np.asarray(x1)),
            (np.asarray(z2), np.asarray(x2)),
            (np.asarray(z3), np.asarray(x3))]


def test_stacked_energy_matches_individual():
    systems = _systems()
    atomnos, coords, mask = pad_systems(systems)
    stacked = StackedLiteFF(systems)
    e_b = np.asarray(stacked.energy(jnp.asarray(coords)))
    for k, (z, x) in enumerate(systems):
        e_k = float(LiteFF(z, x).energy(jnp.asarray(x)))
        assert abs(e_b[k] - e_k) < 1e-8, f"lane {k}"


def test_stacked_forces_zero_on_padding():
    systems = _systems()
    atomnos, coords, mask = pad_systems(systems)
    stacked = StackedLiteFF(systems)
    _, f = stacked.energy_and_forces(jnp.asarray(coords))
    f = np.asarray(f)
    assert np.all(np.isfinite(f))
    assert np.abs(f[~mask]).max() < 1e-10  # dummies feel nothing


def test_batched_mixed_opt_matches_separate_runs():
    """The acceptance criterion: one batched run over 3 different molecules
    returns identical results to 3 separate runs."""
    systems = _systems()
    atomnos, coords, mask = pad_systems(systems)
    stacked = StackedLiteFF(systems)
    res_b = optimize_batch(
        stacked, jnp.asarray(coords), fmax=0.05, max_steps=1500,
        atom_mask=jnp.asarray(mask),
    )
    for k, (z, x) in enumerate(systems):
        calc = LiteFF(z, x)
        res_k = optimize_batch(calc, jnp.asarray(x)[None], fmax=0.05, max_steps=1500)
        assert bool(res_b.converged[k]) == bool(res_k.converged[0])
        np.testing.assert_allclose(
            float(res_b.energy[k]), float(res_k.energy[0]), atol=1e-6
        )
        n_real = len(z)
        np.testing.assert_allclose(
            np.asarray(res_b.coords[k][:n_real]),
            np.asarray(res_k.coords[0]),
            atol=1e-6,
        )


def test_prune_moi_with_atom_mask():
    from firecode_tpu.prune import prune_by_moi
    from firecode_tpu.prune.oracle import np_prune_by_moi

    rng = np.random.default_rng(3)
    z, x = build_ethanol()
    ens = np.asarray(x)[None] + 0.05 * rng.normal(size=(24, len(z), 3))
    ens[12:] *= 1.3  # different moments
    # pad with 4 dummy atoms: keep-list must equal the unpadded run
    pad = 4
    zp = np.concatenate([z, np.zeros(pad, np.int32)])
    ensp = np.concatenate(
        [ens, 50.0 + rng.normal(size=(24, pad, 3))], axis=1
    )
    mask = np.concatenate([np.ones(len(z), bool), np.zeros(pad, bool)])
    keep_ref = np_prune_by_moi(ens, np.asarray(z))
    keep_pad = prune_by_moi(ensp, zp, atom_mask=mask, block=8)
    np.testing.assert_array_equal(keep_ref, keep_pad)


def test_prune_rot_corr_with_atom_mask():
    from firecode_tpu.prune import prune_by_rmsd_rot_corr
    from firecode_tpu.prune.oracle import np_prune_by_rmsd_rot_corr

    rng = np.random.default_rng(4)
    z, x = build_alkane(3)
    n = len(z)
    ens = np.asarray(x)[None] + 0.03 * rng.normal(size=(16, n, 3))
    ens[8:] += 2.0 * np.sign(rng.normal(size=(8, n, 3)))
    perm = np.arange(n)
    perm[[1, 2]] = perm[[2, 1]]  # a (synthetic) symmetric swap
    keep_ref = np_prune_by_rmsd_rot_corr(ens, perm[None], rmsd_thr=0.5)
    # padded run: permutations act as identity on the padding slots
    pad = 3
    zp = np.concatenate([z, np.zeros(pad, np.int32)])
    ensp = np.concatenate([ens, 40.0 + rng.normal(size=(16, pad, 3))], axis=1)
    mask = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
    permp = np.concatenate([perm, np.arange(n, n + pad)])
    keep_pad = prune_by_rmsd_rot_corr(
        ensp, zp, permutations=permp[None], rmsd_thr=0.5, atom_mask=mask, block=8
    )
    np.testing.assert_array_equal(keep_ref, keep_pad)


def test_per_lane_restraints_match_separate_runs():
    """Per-lane constraint targets (the batched-scan engine): one device
    program over B targets reproduces B separate restrained runs."""
    from firecode_tpu.calculators.gfnff import GFNFF, fixtures as fx
    from firecode_tpu.opt.constraints import Constraints, per_lane_restraint_calc

    z, x = fx.butane()
    calc = GFNFF(z, x)
    quad = (0, 1, 2, 3)
    targets = np.array([150.0, 165.0, 180.0])
    scan_calc = per_lane_restraint_calc(calc, "dihedral", quad, targets, k=100.0)
    start = np.broadcast_to(x, (3, *x.shape)).copy()
    res_b = optimize_batch(scan_calc, jnp.asarray(start), fmax=0.1, max_steps=600)
    for i, t in enumerate(targets):
        cons = Constraints().add_dihedral(quad, float(t), k=100.0)
        res_i = optimize_batch(calc, jnp.asarray(x)[None], constraints=cons,
                               fmax=0.1, max_steps=600)
        e_b = float(calc.energy(res_b.coords[i]))
        e_i = float(calc.energy(res_i.coords[0]))
        assert abs(e_b - e_i) < 0.2, (i, e_b, e_i)


def test_stacked_gfnff_matches_individual():
    """Mixed-size bucketed batching for the DEFAULT calculator (VERDICT r3
    item 2): StackedGFNFF energies/forces match per-molecule GFNFF."""
    from firecode_tpu.calculators.gfnff import GFNFF, StackedGFNFF

    systems = _systems()
    stacked = StackedGFNFF(systems)
    coords = jnp.asarray(stacked.padded_coords)
    e_b = np.asarray(stacked.energy(coords))
    for k, (z, x) in enumerate(systems):
        e_k = float(GFNFF(z, x).energy(jnp.asarray(x)))
        # the padded EEQ solve leaks ~3e-6 kcal/mol per dummy slot (see
        # topology._EEQ_PAD_ETA); everything else is exact
        assert abs(e_b[k] - e_k) < 1e-4, f"lane {k}"
    _, f = stacked.energy_and_forces(coords)
    f = np.asarray(f)
    assert np.all(np.isfinite(f))
    assert np.abs(f[~stacked.atom_mask]).max() < 1e-5  # dummies feel ~nothing


def test_batched_mixed_gfnff_opt_matches_separate_runs():
    """One bucketed GFNFF run over 3 different molecules matches 3 separate
    runs (the VERDICT r3 item-2 acceptance criterion, default calculator)."""
    from firecode_tpu.calculators.gfnff import GFNFF, StackedGFNFF

    systems = _systems()
    stacked = StackedGFNFF(systems)
    res_b = optimize_batch(
        stacked, jnp.asarray(stacked.padded_coords), fmax=0.05, max_steps=1500,
        atom_mask=jnp.asarray(stacked.atom_mask),
    )
    for k, (z, x) in enumerate(systems):
        res_k = optimize_batch(
            GFNFF(z, x), jnp.asarray(x)[None], fmax=0.05, max_steps=1500
        )
        assert bool(res_b.converged[k]) == bool(res_k.converged[0])
        np.testing.assert_allclose(
            float(res_b.energy[k]), float(res_k.energy[0]), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(res_b.coords[k][: len(z)]),
            np.asarray(res_k.coords[0]),
            atol=1e-6,
        )


def test_stacked_gfnff_charged_lane():
    """Per-lane charges: a cation lane equilibrates to total charge +1
    while its neutral neighbor stays at 0."""
    from firecode_tpu.calculators.gfnff import StackedGFNFF, GFNFF

    z, x = build_ethanol()
    systems = [(np.asarray(z), np.asarray(x)), (np.asarray(z), np.asarray(x))]
    stacked = StackedGFNFF(systems, charges=[0, 1])
    e_b = np.asarray(stacked.energy(jnp.asarray(stacked.padded_coords)))
    e0 = float(GFNFF(z, x, charge=0).energy(jnp.asarray(x)))
    e1 = float(GFNFF(z, x, charge=1).energy(jnp.asarray(x)))
    assert abs(e_b[0] - e0) < 1e-4
    assert abs(e_b[1] - e1) < 1e-4
    assert abs(e_b[1] - e_b[0]) > 1.0  # ionization is not a no-op


def test_standalone_optimizer_buckets_multiple_files(tmp_path, monkeypatch):
    """firecode-tpu-opt over several files runs ONE bucketed device program
    and reproduces per-file outputs (VERDICT r2 item 7, CLI surface)."""
    import os

    from firecode_tpu.driver.standalone_optimizer import main
    from firecode_tpu.ensemble import Ensemble
    from firecode_tpu.io.xyz import write_xyz
    from firecode_tpu.pt import SYMBOLS

    monkeypatch.chdir(tmp_path)
    for name, (z, x) in (("ma.xyz", build_alkane(2)), ("mb.xyz", build_ethanol())):
        write_xyz(name, [SYMBOLS[zz] for zz in np.asarray(z)], np.asarray(x)[None])
    main(["ma.xyz", "mb.xyz", "--calc", "LITEFF"])
    assert os.path.exists("ma_opt.xyz") and os.path.exists("mb_opt.xyz")
    for name, (z, _) in (("ma_opt.xyz", build_alkane(2)), ("mb_opt.xyz", build_ethanol())):
        ens = Ensemble.from_xyz(name)
        assert ens.coords.shape[1] == len(z)  # un-padded on output


def test_standalone_optimizer_buckets_default_calculator(
    tmp_path, monkeypatch, capsys
):
    """Under the DEFAULT config (no --calc flag; settings default GFNFF),
    multiple files still run as ONE bucketed device program — the round-3
    gap where the feature silently degraded to serial per-file loops."""
    import os

    from firecode_tpu.driver.standalone_optimizer import main
    from firecode_tpu.ensemble import Ensemble
    from firecode_tpu.io.xyz import write_xyz
    from firecode_tpu.pt import SYMBOLS

    monkeypatch.chdir(tmp_path)
    monkeypatch.delenv("FIRECODE_TPU_CALCULATOR", raising=False)
    for name, (z, x) in (("ma.xyz", build_alkane(2)), ("mb.xyz", build_ethanol())):
        write_xyz(name, [SYMBOLS[zz] for zz in np.asarray(z)], np.asarray(x)[None])
    main(["ma.xyz", "mb.xyz"])
    out = capsys.readouterr().out
    assert "bucketed batch" in out  # the one-device-program path triggered
    assert os.path.exists("ma_opt.xyz") and os.path.exists("mb_opt.xyz")
    for name, (z, _) in (
        ("ma_opt.xyz", build_alkane(2)), ("mb_opt.xyz", build_ethanol())
    ):
        ens = Ensemble.from_xyz(name)
        assert ens.coords.shape[1] == len(z)  # un-padded on output
