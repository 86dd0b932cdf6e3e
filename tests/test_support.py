import os
import time

import numpy as np
import pytest

from firecode_tpu.context_managers import (
    HiddenPrints,
    clean_directory,
    env_override,
    new_folder_context,
)
from firecode_tpu.profiling import Profiler
from firecode_tpu.quotes import random_quote
from firecode_tpu.references import references, references_for_options
from firecode_tpu.solvents import get_epsilon, normalize_solvent


def test_hidden_prints(capsys):
    with HiddenPrints():
        print("you should not see this")
    print("visible")
    out = capsys.readouterr().out
    assert "not see" not in out
    assert "visible" in out


def test_env_override():
    os.environ["FC_TEST_VAR"] = "original"
    with env_override(FC_TEST_VAR="patched", FC_TEST_NEW="x"):
        assert os.environ["FC_TEST_VAR"] == "patched"
        assert os.environ["FC_TEST_NEW"] == "x"
    assert os.environ["FC_TEST_VAR"] == "original"
    assert "FC_TEST_NEW" not in os.environ


def test_new_folder_context(tmp_path):
    old = os.getcwd()
    os.chdir(tmp_path)
    try:
        with new_folder_context("scratch") as p:
            assert os.getcwd() == str(p)
            (p / "tempfile").write_text("x")
        assert os.getcwd() == str(tmp_path)
        assert not p.exists()
    finally:
        os.chdir(old)


def test_clean_directory(tmp_path):
    old = os.getcwd()
    os.chdir(tmp_path)
    try:
        (tmp_path / "temp_thing").write_text("x")
        (tmp_path / "Candidate_3.traj").write_text("x")
        (tmp_path / "keep.xyz").write_text("x")
        clean_directory()
        assert not (tmp_path / "temp_thing").exists()
        assert not (tmp_path / "Candidate_3.traj").exists()
        assert (tmp_path / "keep.xyz").exists()
    finally:
        os.chdir(old)


def test_profiler_report():
    p = Profiler()
    with p.timer("stage_a"):
        time.sleep(0.01)
    p.add("stage_b", 1.5)
    report = p.report()
    assert "stage_a" in report and "stage_b" in report
    assert "total elapsed" in report


def test_quotes():
    quote, author = random_quote()
    assert isinstance(quote, str) and len(quote) > 10


def test_references_selection():
    from firecode_tpu.driver.options import Options

    o = Options()
    refs = references_for_options(o)
    assert references["QCP"] in refs
    o.solvent = "water"
    o.freq = True
    refs = references_for_options(o)
    assert references["GB"] in refs
    assert references["QRRHO"] in refs


def test_solvents():
    assert normalize_solvent("DCM") == "dcm"
    assert normalize_solvent("CH2Cl2") == "dcm"
    assert get_epsilon("water") > 70
    with pytest.raises(KeyError):
        get_epsilon("unobtainium")


def test_modify_settings_non_interactive(capsys):
    from firecode_tpu.modify_settings import run_setup

    run_setup(interactive=False)
    out = capsys.readouterr().out
    assert "FIRECODE_TPU_CALCULATOR" in out


def test_atropisomer_scan_machinery(rng):
    # coarse machinery check: scan of butane's central dihedral finds the
    # eclipsed barrier(s)
    from firecode_tpu.atropisomers import ase_dih_scan
    from firecode_tpu.calculators import LiteFF
    from firecode_tpu.sample_molecules import build_alkane

    atomnos, coords = build_alkane(4)
    calc = LiteFF(atomnos, coords)
    angles, energies, frames = ase_dih_scan(
        calc, coords, (0, 1, 2, 3), n_points=12
    )
    assert len(angles) == 13
    rel = energies - energies.min()
    assert rel.max() > 0.5  # a real torsional barrier shows up


# ---------------------------------------------------- symmetry fingerprints
# (firecode/rdkit_tools.py:127-402 capability, implemented on the native
# molecular graph — no rdkit needed for the symmetry half)


def _methanol():
    z = np.array([6, 8, 1, 1, 1, 1])
    c = np.array(
        [[0.0, 0, 0], [1.42, 0, 0], [1.75, 0.89, 0],
         [-0.38, 0.51, 0.89], [-0.38, 0.51, -0.89], [-0.38, -1.02, 0]]
    )
    return z, c


def test_symmetric_positions_methyl_hydrogens():
    from firecode_tpu.rdkit_tools import find_symmetric_positions

    z, c = _methanol()
    # match covering all atoms: the 3 methyl H's (pos 3,4,5) are equivalent;
    # the hydroxyl H (pos 2) is NOT
    groups = find_symmetric_positions(z, c, tuple(range(6)))
    assert [3, 4, 5] in groups
    assert all(2 not in g for g in groups)


def test_symmetric_positions_water():
    from firecode_tpu.rdkit_tools import find_symmetric_positions

    z = np.array([8, 1, 1])
    c = np.array([[0.0, 0, 0.119], [0.0, 0.763, -0.477], [0.0, -0.763, -0.477]])
    groups = find_symmetric_positions(z, c, (0, 1, 2))
    assert groups == [[1, 2]]


def test_expand_symmetric_matches():
    from firecode_tpu.rdkit_tools import expand_symmetric_matches

    out = expand_symmetric_matches((10, 20, 30), [[1, 2]])
    assert set(out) == {(10, 20, 30), (10, 30, 20)}
    out2 = expand_symmetric_matches((1, 2, 3), [[0, 1, 2]])
    assert len(out2) == 6  # all 3! permutations


def test_environment_fingerprint_distinguishes_oxygens():
    from firecode_tpu.graphs import graphize
    from firecode_tpu.rdkit_tools import atom_environment_fingerprint

    # formic acid: carbonyl O (degree 1) vs hydroxyl O (degree 2)
    z = np.array([6, 8, 8, 1, 1])
    c = np.array([[0.0, 0, 0], [1.2, 0.2, 0], [-0.8, 1.05, 0],
                  [-0.45, -1.0, 0], [-0.35, 1.9, 0]])
    g = graphize(z, c)
    fp_carbonyl = atom_environment_fingerprint(g, z, 1)
    fp_hydroxyl = atom_environment_fingerprint(g, z, 2)
    assert fp_carbonyl != fp_hydroxyl


@pytest.mark.slow
def test_fine_rescan_refines_peak(rng):
    from firecode_tpu.atropisomers import ase_dih_scan, fine_rescan, _find_peaks
    from firecode_tpu.calculators import LiteFF
    from firecode_tpu.sample_molecules import build_alkane

    atomnos, coords = build_alkane(4)
    calc = LiteFF(atomnos, coords)
    angles, energies, frames = ase_dih_scan(calc, coords, (0, 1, 2, 3), n_points=12)
    peaks = _find_peaks(energies - energies.min())
    assert peaks
    frame, angle, fine_e = fine_rescan(
        calc, frames[peaks[0]], (0, 1, 2, 3), half_width=2.0, step=1.0
    )
    assert fine_e.shape == (5,)
    # the refined maximum is at least as high as every fine-scan sample
    assert fine_e.max() == fine_e[np.argmax(fine_e)]
    delta = (angle - angles[peaks[0]]) % 360.0
    assert min(delta, 360.0 - delta) <= 2.0 + 1e-6
