"""Golden-input end-to-end tests: real input files through the full driver,
asserting normal termination (SystemExit(0)) — the reference's test strategy
(reference test_suite.py:73-84), plus output-artifact checks."""

import os

import numpy as np
import pytest

from firecode_tpu.io.xyz import write_xyz
from firecode_tpu.pt import symbols_from_atomnos
from firecode_tpu.sample_molecules import build_alkane
from tests.test_embed import ETHENE, ETHENE_Z, HF, HF_Z, NH3, NH3_Z


@pytest.fixture
def rundir(tmp_path):
    old = os.getcwd()
    os.chdir(tmp_path)
    yield tmp_path
    os.chdir(old)


def run_input(rundir, input_text: str, files: dict[str, tuple]) -> None:
    """Write molecule files + input, run the Embedder, expect SystemExit(0)."""
    for name, (atomnos, coords) in files.items():
        write_xyz(rundir / name, symbols_from_atomnos(atomnos), coords)
    (rundir / "input.txt").write_text(input_text)

    from firecode_tpu.driver import Embedder

    with pytest.raises(SystemExit) as exc:
        embedder = Embedder(str(rundir / "input.txt"), stamp="test")
        embedder.run()
    assert exc.value.code == 0


@pytest.mark.embed
def test_refine_run(rundir, rng):
    atomnos, coords = build_alkane(4)
    confs = np.stack([coords + rng.normal(scale=0.05, size=coords.shape) for _ in range(6)])
    run_input(
        rundir,
        "REFINE KCAL=20\nbutane.xyz\n",
        {"butane.xyz": (atomnos, confs)},
    )
    assert (rundir / "firecode_final_ensemble_test.xyz").exists()
    assert (rundir / "firecode_best.xyz").exists()


@pytest.mark.embed
def test_string_embed_run(rundir):
    run_input(
        rundir,
        "STEPS=8\nhf.xyz 0\nnh3.xyz 0\n",
        {"hf.xyz": (HF_Z, HF), "nh3.xyz": (NH3_Z, NH3)},
    )
    assert (rundir / "firecode_final_ensemble_test.xyz").exists()


@pytest.mark.embed
def test_cyclical_embed_run(rundir):
    run_input(
        rundir,
        "STEPS=2 KCAL=50\ne1.xyz 0 1\ne2.xyz 0 1\n",
        {"e1.xyz": (ETHENE_Z, ETHENE), "e2.xyz": (ETHENE_Z, ETHENE)},
    )
    assert (rundir / "firecode_final_ensemble_test.xyz").exists()
    log = (rundir / "firecode_test.log").read_text()
    assert "normal termination" in log


@pytest.mark.operator
def test_csearch_operator_run(rundir):
    atomnos, coords = build_alkane(5)
    run_input(
        rundir,
        "NOOPT\ncsearch> pentane.xyz\n",
        {"pentane.xyz": (atomnos, coords)},
    )
    assert (rundir / "pentane_confs.xyz").exists()


@pytest.mark.operator
def test_noopt_bypass_keywords(rundir):
    run_input(
        rundir,
        "BYPASS STEPS=2\ne1.xyz 0 1\ne2.xyz 0 1\n",
        {"e1.xyz": (ETHENE_Z, ETHENE), "e2.xyz": (ETHENE_Z, ETHENE)},
    )
    # the unoptimized ensemble is renamed to final at normal termination
    assert (rundir / "firecode_final_ensemble_test.xyz").exists()
    assert (rundir / "firecode_embedded_test.xyz").exists()


def test_unknown_keyword_suggestion(rundir):
    from firecode_tpu.driver import Embedder

    (rundir / "mol.xyz").write_text("1\nc\nH 0 0 0\n")
    (rundir / "input.txt").write_text("STEPZ=3\nmol.xyz\n")
    with pytest.raises(SyntaxError, match="STEPS"):
        Embedder(str(rundir / "input.txt"), stamp="test")


def test_dryrun(rundir):
    run_input(
        rundir,
        "DRYRUN STEPS=2\ne1.xyz 0 1\ne2.xyz 0 1\n",
        {"e1.xyz": (ETHENE_Z, ETHENE), "e2.xyz": (ETHENE_Z, ETHENE)},
    )
    # dry run produces no ensembles
    assert not (rundir / "firecode_final_ensemble_test.xyz").exists()


@pytest.mark.embed
def test_pairing_letters_and_dist(rundir):
    """Pairing letters restrict arrangements; DIST imposes embed distances."""
    run_input(
        rundir,
        "STEPS=2 KCAL=50 DIST(a=3.0)\ne1.xyz 0a 1\ne2.xyz 0a 1\n",
        {"e1.xyz": (ETHENE_Z, ETHENE), "e2.xyz": (ETHENE_Z, ETHENE)},
    )
    log = (rundir / "firecode_test.log").read_text()
    assert "Atom pairings imposed" in log
    assert (rundir / "firecode_final_ensemble_test.xyz").exists()
    # the paired atoms (cum 0 and 6) should sit near the imposed 3.0 A
    from firecode_tpu.io.xyz import read_xyz

    _, coords, _ = read_xyz(rundir / "firecode_final_ensemble_test.xyz")
    d = np.linalg.norm(coords[0][0] - coords[0][6])
    assert 1.5 < d < 4.5


@pytest.mark.embed
def test_debug_dump_status(rundir, rng):
    """DEBUG keyword writes full run-state dumps at stage boundaries
    (reference embedder.py:1887-1954 dump_status)."""
    atomnos, coords = build_alkane(4)
    confs = np.stack([coords + rng.normal(scale=0.05, size=coords.shape) for _ in range(4)])
    run_input(
        rundir,
        "REFINE KCAL=20 DEBUG\nbutane.xyz\n",
        {"butane.xyz": (atomnos, confs)},
    )
    import glob

    dumps = glob.glob(str(rundir / "firecode_debug_test_*"))
    assert any(d.endswith(".xyz") for d in dumps)
    assert any(d.endswith(".npz") for d in dumps)
    assert any(d.endswith("_options.txt") for d in dumps)


def test_loadbar_and_eta(capsys):
    from firecode_tpu.profiling import eta_report, loadbar

    loadbar(5, 10, prefix="opt")
    loadbar(10, 10, prefix="opt")
    out = capsys.readouterr().out
    assert "50.0%" in out and "100.0%" in out
    line = eta_report(25, 100, elapsed_s=50.0)
    assert "25/100" in line and "2.000 s/structure" in line and "ETA 150 s" in line


@pytest.mark.operator
def test_goat_native_operator_run(rundir):
    """goat_native> end-to-end through the input language: small budgets,
    butane — must terminate normally and write the pool ensemble."""
    atomnos, coords = build_alkane(4)
    run_input(
        rundir,
        "NOOPT\ngoat_native(walkers=2,rounds=2,uphill_steps=120,dep_every=40)> "
        "butane.xyz\n",
        {"butane.xyz": (atomnos, coords)},
    )
    out = rundir / "butane_goat.xyz"
    assert out.exists()
    assert out.read_text().count("\n") > 10  # at least one real frame


@pytest.mark.embed
def test_refine_run_gfnff_topo(rundir, rng):
    """CALC=GFNFF-TOPO (fixed setup charges) drives the full refine
    pipeline end-to-end through the input language."""
    atomnos, coords = build_alkane(4)
    confs = np.stack(
        [coords + rng.normal(scale=0.05, size=coords.shape) for _ in range(4)]
    )
    run_input(
        rundir,
        "REFINE KCAL=20 CALC=GFNFF-TOPO\nbutane.xyz\n",
        {"butane.xyz": (atomnos, confs)},
    )
    assert (rundir / "firecode_final_ensemble_test.xyz").exists()
