"""Exact input-file generation for the external-engine interfaces (VERDICT
round-1 item 5): CREST 2 legacy .inp with metadyn range compression, CREST 2
command-line flags, CREST 3 TOML (single + dual level, typed constraints,
cregen ewin), ORCA GOAT %goat/%geom blocks, and the xtb constrain file with
angle/dihedral support + the recursive stepping ladder."""

import numpy as np

from firecode_tpu.interfaces.crest import (
    build_crest2_input,
    build_crest3_toml,
    compress_ranges,
    crest2_flags,
)
from firecode_tpu.interfaces.goat import build_goat_input


def test_compress_ranges():
    assert compress_ranges([1, 2, 3, 5, 7, 8]) == "1-3,5,7-8"
    assert compress_ranges([4]) == "4"
    assert compress_ranges([]) == ""
    assert compress_ranges([1, 3, 5]) == "1,3,5"
    assert compress_ranges(list(range(1, 11))) == "1-10"


def test_crest2_input_exact():
    text = build_crest2_input(
        n_atoms=8,
        constrained_indices=[(0, 4)],
        constrained_distances=[2.1],
        constrained_dihedrals_indices=[(0, 1, 2, 3)],
        constrained_dihedrals_values=[None],
    )
    assert text == (
        "$opt\n"
        "$constrain\n"
        "   distance: 1, 5, 2.100\n"
        "   dihedral: 1, 2, 3, 4, auto\n"
        "$metadyn\n"
        "   atoms: 6-8\n"
        "$end\n"
    )


def test_crest2_input_no_constraints_all_atoms_active():
    text = build_crest2_input(n_atoms=5)
    assert "$constrain" not in text
    assert "atoms: 1-5" in text


def test_crest2_flags():
    flags = crest2_flags(
        method="GFN2-XTB//GFN-FF", charge=-1, solvent="dcm", kcal=5.0,
        ncimode=True, procs=4, threads=2,
    )
    assert flags == [
        "--norestart", "--gfn2//gfnff", "--chrg", "-1", "-P", "4", "-T", "2",
        "--alpb", "ch2cl2", "--ewin", "5.0", "--nci", "--noreftopo",
    ]
    # methanol has no ALPB parametrization: GBSA fallback
    assert "--gbsa" in crest2_flags(solvent="methanol")
    # default energy window
    assert crest2_flags()[-3:] == ["--ewin", "10", "--noreftopo"]


def test_crest3_toml_dual_level():
    text = build_crest3_toml(
        "job", method="GFN2-XTB//GFN-FF", charge=1, solvent="toluene",
        kcal=6.0, ncimode=False, threads=8,
        constrained_indices=[(2, 7)], constrained_distances=[1.85],
    )
    assert "input = 'job.xyz'" in text
    assert "runtype = 'imtd-gc'" in text
    assert "topo = false" in text
    assert "threads = 8" in text
    # dual level: gfnff block first, gfn2 second, dynamics active on level 1
    i_ff = text.index("method = 'gfnff'")
    i_g2 = text.index("method = 'gfn2'")
    assert i_ff < i_g2
    assert "[dynamics]\nactive = [1]" in text
    assert text.count("chrg = 1") == 2  # both level blocks carry the charge
    assert text.count("alpb = 'toluene'") == 2
    assert (
        "[[calculation.constraint]]\ntype = 'bond'\natoms = [3, 8]\nval = 1.85"
        in text
    )
    assert "[cregen]\newin = 6.0" in text


def test_crest3_toml_single_level_nci():
    text = build_crest3_toml("x", method="GFN-FF", ncimode=True)
    assert "runtype = 'nci-mtd'" in text
    assert text.count("[[calculation.level]]") == 1
    assert "method = 'gfnff'" in text
    assert "[dynamics]" not in text
    assert "ewin = 10" in text


def test_goat_input_exact_blocks():
    coords = np.array([[0.0, 0, 0], [1.1, 0, 0], [2.2, 0, 0]])
    text = build_goat_input(
        ["C", "O", "H"], coords,
        method="GFN2-XTB//GFN-FF", solvent="dcm", charge=-1, multiplicity=2,
        kcal=7.5, ncimode=True, procs=4,
        constrained_indices=[(0, 1)], constrained_distances=[None],
        constrained_dihedrals_indices=[(0, 1, 2, 0)],
        constrained_dihedrals_values=[120.0],
    )
    assert text.startswith("! XTB2 GOAT ALPB(ch2cl2)")
    assert "%pal\n  nprocs 4\nend" in text
    goat_block = text[text.index("%goat"):]
    goat_block = goat_block[: goat_block.index("end")]
    assert "MAXEN 7.5" in goat_block
    assert "ALIGN true" in goat_block
    assert "GFNUPHILL GFNFF" in goat_block  # dual level
    assert "AUTOWALL true" in goat_block  # nci mode
    assert "{B 0 1 C}" in text  # constrain to current value
    assert "{D 0 1 2 0 120.0}" in text
    assert "* xyz -1 2" in text
    assert text.rstrip().endswith("*")


def test_goat_input_single_level_defaults():
    text = build_goat_input(["H", "H"], np.zeros((2, 3)), method="GFN-FF", procs=1)
    assert text.startswith("! GFNFF GOAT\n")
    assert "%pal" not in text
    assert "GFNUPHILL" not in text
    assert "%geom" not in text
    assert "* xyz 0 1" in text


def test_xtb_constrain_file_with_angles_and_dihedrals(tmp_path):
    from firecode_tpu.calculators.xtb_io import _write_constrain_file

    path = tmp_path / "c.inp"
    _write_constrain_file(
        path,
        constrained_indices=[(0, 3)],
        constrained_distances=[1.5],
        constrained_angles_indices=[(0, 1, 2)],
        constrained_angles_values=[None],
        constrained_dihedrals_indices=[(0, 1, 2, 3)],
        constrained_dihedrals_values=[90.0],
        force_constant=0.25,
    )
    assert path.read_text() == (
        "$constrain\n"
        "  force constant=0.25\n"
        "  distance: 1, 4, 1.5\n"
        "  angle: 1, 2, 3, auto\n"
        "  dihedral: 1, 2, 3, 4, 90.0\n"
        "$end\n"
    )


def test_xtb_recursive_ladder_steps(monkeypatch):
    """The stepping ladder walks a 1.2 A gap in <= 0.3 A rungs with a soft
    spring, snaps onto each rung, then runs the final tight optimization."""
    from firecode_tpu.calculators import xtb_io

    calls = []

    def fake_opt_once(atomnos, coords, **kw):
        targets = kw.get("constrained_distances")
        calls.append(
            {
                "target": None if targets is None else list(targets),
                "conv": kw.get("conv_thr", "tight"),
                "fc": kw.get("force_constant", 1.0),
            }
        )
        out = np.asarray(coords, dtype=np.float64).copy()
        if targets is not None:  # an ideal optimizer lands on the rung
            out[1] = [float(targets[0]), 0.0, 0.0]
        return out, -10.0, True

    monkeypatch.setattr(xtb_io, "_xtb_opt_once", fake_opt_once)
    coords = np.array([[0.0, 0, 0], [3.0, 0, 0]])  # current d = 3.0
    out, energy, ok = xtb_io.xtb_opt(
        np.array([6, 6]), coords,
        constrained_indices=[(0, 1)], constrained_distances=[1.75],
    )
    assert ok
    # rungs walk 3.0 -> 2.7 -> 2.4 -> 2.1 -> 1.8, then |1.8 - 1.75| <= step
    ladder = [c for c in calls if c["conv"] == "loose"]
    assert [round(c["target"][0], 6) for c in ladder] == [2.7, 2.4, 2.1, 1.8]
    assert all(c["fc"] == 0.25 for c in ladder)
    # final call: tight, full force constant, exact target
    assert calls[-1]["conv"] == "tight"
    assert calls[-1]["target"] == [1.75]
    # the snap put the constrained pair exactly on target
    assert abs(np.linalg.norm(out[1] - out[0]) - 1.75) < 1e-9


def test_molecule_check_batch():
    from firecode_tpu.graphs import molecule_check_batch

    before = np.array([[[0.0, 0, 0], [1.0, 0, 0], [2.0, 0, 0]]] * 2)
    after = before.copy()
    after[1, 2] = [8.0, 0, 0]  # second frame breaks a bond
    ok = molecule_check_batch(np.array([6, 6, 6]), before, after)
    assert ok.tolist() == [True, False]


def test_xtb_solvent_names():
    from firecode_tpu.solvents import get_xtb_solvent_name

    assert get_xtb_solvent_name("DCM") == "ch2cl2"
    assert get_xtb_solvent_name("dichloromethane") == "ch2cl2"
    assert get_xtb_solvent_name("water") == "water"
    assert get_xtb_solvent_name("exotic") == "exotic"  # pass-through
