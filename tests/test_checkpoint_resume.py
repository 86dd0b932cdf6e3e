"""Checkpoint / resume end-to-end: kill a run mid-pipeline and resume it to
the identical final ensemble (VERDICT round-1 item 6; reference checkpoint
cadence firecode/embedder.py:2213-2240, which has no consume side)."""

import os
import pytest

# heavy e2e module: excluded from the fast default
# selection (pytest -m '' runs everything)
pytestmark = pytest.mark.slow


import numpy as np
import pytest

from firecode_tpu.io.xyz import read_xyz, write_xyz
from firecode_tpu.pt import symbols_from_atomnos
from firecode_tpu.sample_molecules import build_alkane
from tests.test_driver import rundir  # noqa: F401


def _write_refine_input(rundir, rng, n_confs=6):
    atomnos, coords = build_alkane(4)
    confs = np.stack(
        [coords + rng.normal(scale=0.05, size=coords.shape) for _ in range(n_confs)]
    )
    write_xyz(rundir / "butane.xyz", symbols_from_atomnos(atomnos), confs)
    (rundir / "input.txt").write_text("REFINE KCAL=20\nbutane.xyz\n")


def _run(rundir, stamp, resume=None):
    from firecode_tpu.driver import Embedder

    with pytest.raises(SystemExit) as exc:
        Embedder(str(rundir / "input.txt"), stamp=stamp, resume=resume).run()
    assert exc.value.code == 0


def test_kill_and_resume_identical_output(rundir, rng, monkeypatch):
    _write_refine_input(rundir, rng)

    # reference run: straight through
    _run(rundir, "full")
    want = read_xyz(rundir / "firecode_final_ensemble_full.xyz")

    # killed run: crash on the first batched optimization call; the
    # pre_optimization snapshot must already be on disk by then
    import firecode_tpu.opt as opt_mod

    real_optimize = opt_mod.optimize_batch

    def boom(*a, **k):
        raise RuntimeError("simulated kill")

    monkeypatch.setattr(opt_mod, "optimize_batch", boom)
    from firecode_tpu.driver import Embedder

    with pytest.raises(RuntimeError, match="simulated kill"):
        Embedder(str(rundir / "input.txt"), stamp="killed").run()
    monkeypatch.setattr(opt_mod, "optimize_batch", real_optimize)

    state = rundir / "firecode_state_killed.npz"
    assert state.exists()
    assert str(np.load(state)["stage"]) == "pre_optimization"

    # resumed run: skips generation/pruning, runs optimization, terminates
    _run(rundir, "resumed", resume=str(state))
    got = read_xyz(rundir / "firecode_final_ensemble_resumed.xyz")

    assert list(got[0]) == list(want[0])  # same atoms
    np.testing.assert_allclose(got[1], want[1], atol=1e-8)


def test_mid_stage_done_mask_resume(rundir, rng):
    """Structures marked done in the snapshot are skipped and keep their
    snapshot energies; the final ensemble matches the uninterrupted run."""
    _write_refine_input(rundir, rng)

    from firecode_tpu.driver import Embedder
    from firecode_tpu.driver.checkpoint import load_state, save_state
    from firecode_tpu.driver.embedder import RunEmbedding

    with pytest.raises(SystemExit):
        emb = Embedder(str(rundir / "input.txt"), stamp="ref")
        emb.run()
    want = read_xyz(rundir / "firecode_final_ensemble_ref.xyz")

    # fresh embedder, stop after the pre-optimization stages
    emb2 = Embedder(str(rundir / "input.txt"), stamp="mid")
    run2 = RunEmbedding(emb2)
    run2.generate_candidates()
    run2.compenetration_refining()
    run2.similarity_refining(rmsd=True)

    # run the tight stage fully once to learn the "already done" results...
    pre_structures = run2.structures.copy()
    run2.optimization_refining(conv_thr="tight", only_fixed_constraints=True)
    done_coords = run2.structures.copy()
    done_energies = run2.energies.copy()

    # ...then rewind, mark half the ensemble done (with its optimized state),
    # snapshot, and resume the stage from that snapshot
    b = len(pre_structures)
    half = np.zeros(b, dtype=bool)
    half[: b // 2] = True
    emb3 = Embedder(str(rundir / "input.txt"), stamp="mid2")
    run3 = RunEmbedding(emb3)
    run3.generate_candidates()
    run3.compenetration_refining()
    run3.similarity_refining(rmsd=True)
    run3.structures[half] = done_coords[half]
    run3.energies = np.where(half, done_energies, 0.0)
    save_state(run3, "optimization_tight", path=rundir / "mid.npz", done=half)

    emb4 = Embedder(str(rundir / "input.txt"), stamp="mid3")
    stage = load_state(emb4, rundir / "mid.npz")
    assert stage == "optimization_tight"
    assert emb4._resume_done is not None
    run4 = RunEmbedding(emb4)
    run4.optimization_refining(
        conv_thr="tight", only_fixed_constraints=True, resume_done=emb4._resume_done
    )
    run4.write_structures("ensemble", energies=True)
    os.rename(run4.outname, rundir / "resumed.xyz")
    got = read_xyz(rundir / "resumed.xyz")
    np.testing.assert_allclose(
        np.sort(got[1].ravel()), np.sort(want[1].ravel()), atol=1e-6
    )


def test_cli_has_resume_flag():
    import argparse

    from firecode_tpu import cli

    parser = argparse.ArgumentParser()
    # smoke: --resume is accepted by the real parser
    with pytest.raises(SystemExit):
        cli.main(["--help"])


def test_resume_from_loose_stage_snapshot(rundir, rng):
    """A snapshot tagged optimization_loose forces the loose stage on resume
    (even below the 500-structure threshold) and then completes normally."""
    _write_refine_input(rundir, rng, n_confs=4)

    from firecode_tpu.driver import Embedder
    from firecode_tpu.driver.checkpoint import save_state
    from firecode_tpu.driver.embedder import RunEmbedding

    emb = Embedder(str(rundir / "input.txt"), stamp="loose")
    run = RunEmbedding(emb)
    run.generate_candidates()
    run.compenetration_refining()
    run.similarity_refining(rmsd=True)
    done = np.zeros(len(run.structures), dtype=bool)
    run.energies = np.zeros(len(run.structures))
    save_state(run, "optimization_loose", path=rundir / "loose.npz", done=done)

    _run(rundir, "resumed_loose", resume=str(rundir / "loose.npz"))
    assert (rundir / "firecode_final_ensemble_resumed_loose.xyz").exists()
    log = (rundir / "firecode_resumed_loose.log").read_text()
    assert "Resuming from" in log
    assert "Structure optimization (loose)" in log
    assert "Structure optimization (tight)" in log
