"""Keyword-line coverage: each keyword's effect on Options, checked through
cheap DRYRUN driver invocations."""

import numpy as np
import pytest

from firecode_tpu.io.xyz import write_xyz
from firecode_tpu.pt import symbols_from_atomnos
from tests.test_driver import rundir  # noqa: F401
from tests.test_embed import ETHENE, ETHENE_Z


def setup_embedder(rundir, kw_line: str, extra_lines: str = ""):
    from firecode_tpu.driver import Embedder

    write_xyz(rundir / "e1.xyz", symbols_from_atomnos(ETHENE_Z), ETHENE)
    write_xyz(rundir / "e2.xyz", symbols_from_atomnos(ETHENE_Z), ETHENE)
    (rundir / "input.txt").write_text(
        f"{kw_line} DRYRUN\ne1.xyz 0 1\ne2.xyz 0 1\n{extra_lines}"
    )
    return Embedder(str(rundir / "input.txt"), stamp="kw")


def test_many_keywords(rundir):
    emb = setup_embedder(
        rundir,
        "DEEP CLASHES(num=2,dist=1.2) T_C=25 NEWBONDS=1 ROTRANGE=90 "
        "ONLYREFINED LET NCI CONFS=5 KCAL=7.5 CHARGE=-1 MULT=3 EZPROT "
        "SCRAMBLECHECK SIMPLEORBITALS FFOPT=OFF",
    )
    o = emb.options
    # DEEP sets these, then CLASHES overrides its clash values
    assert o.rmsd == 0.1 and o.rotation_steps is not None
    assert o.max_clashes == 2 and o.clash_thresh == 1.2
    assert abs(o.T - 298.15) < 1e-9
    assert o.max_newbonds == 1
    assert o.rotation_range == 90
    assert o.only_refined and o.let and o.nci
    assert o.max_confs == 5
    assert o.kcal_thresh == 7.5
    assert o.charge == -1 and o.mult == 3
    assert o.double_bond_protection and o.scramble_check
    assert o.simpleorbitals and not o.ff_opt
    assert o.dryrun


def test_t_celsius(rundir):
    emb = setup_embedder(rundir, "T_C=25.0")
    assert abs(emb.options.T - 298.15) < 1e-9


def test_shrink_scales_pivots(rundir):
    emb_plain = setup_embedder(rundir, "")
    plain_norm = emb_plain.objects[0].pivots[0][0].norm
    emb_shrink = setup_embedder(rundir, "SHRINK=2.0")
    assert emb_shrink.options.shrink_multiplier == 2.0
    shrunk_norm = emb_shrink.objects[0].pivots[0][0].norm
    # SHRINK enlarges lobes -> cross-face pivots lengthen
    norms_p = sorted(p.norm for p in emb_plain.objects[0].pivots[0])
    norms_s = sorted(p.norm for p in emb_shrink.objects[0].pivots[0])
    assert norms_s[-1] > norms_p[-1]
    assert emb_shrink.options.only_refined


def test_neb_suboptions(rundir):
    emb = setup_embedder(rundir, "NEB(images=11,ci=false)")
    assert emb.options.neb.n_images == 11
    assert not emb.options.neb.climbing_image
    assert emb.options.neb.preopt


def test_suprafac_halves_pivots(rundir):
    emb_plain = setup_embedder(rundir, "")
    emb_supra = setup_embedder(rundir, "SUPRAFAC")
    assert len(emb_supra.objects[0].pivots[0]) < len(emb_plain.objects[0].pivots[0])


def test_multi_letter_pairing_fragment(rundir):
    from firecode_tpu.driver import Embedder

    write_xyz(rundir / "e1.xyz", symbols_from_atomnos(ETHENE_Z), ETHENE)
    write_xyz(rundir / "e2.xyz", symbols_from_atomnos(ETHENE_Z), ETHENE)
    (rundir / "input.txt").write_text(
        "DRYRUN\ne1.xyz 0ab 1\ne2.xyz 0a 1b\n"
    )
    emb = Embedder(str(rundir / "input.txt"), stamp="kw")
    # '0ab' assigns atom 0 to both letters a and b
    assert emb.pairings_table["a"] == (0, 6)
    assert emb.pairings_table["b"] == (0, 7)


def test_standalone_constraint_file_with_smarts_header(tmp_path):
    from firecode_tpu.driver.standalone_optimizer import parse_constraint_file

    p = tmp_path / "c.txt"
    p.write_text("SMARTS [OX2H]\nB 0 1 1.5\nA 0 1 2  # comment\n")
    specs, smarts = parse_constraint_file(p)
    assert smarts == "[OX2H]"
    assert specs == [("B", (0, 1), "1.5"), ("A", (0, 1, 2), "auto")]

    p2 = tmp_path / "plain.txt"
    p2.write_text("D 0 1 2 3 90.0\n")
    specs2, smarts2 = parse_constraint_file(p2)
    assert smarts2 is None
    assert specs2 == [("D", (0, 1, 2, 3), "90.0")]


def test_multiplicity_check():
    import numpy as np

    from firecode_tpu.driver.standalone_optimizer import multiplicity_check

    water = np.array([8, 1, 1])  # 10 electrons -> singlet ok, doublet not
    assert multiplicity_check(water, 0, 1)
    assert not multiplicity_check(water, 0, 2)
    assert multiplicity_check(water, -1, 2)  # 11 electrons -> doublet


def test_neb_suboption_affirmative_forms():
    """NEB(preopt=true), NEB(ci=true), NEB(pairs=false) must parse (a prior
    version rejected the affirmative forms its own error message suggested)."""
    from types import SimpleNamespace

    from firecode_tpu.driver.options import Options, OptionSetter

    def parse(kw_line):
        emb = SimpleNamespace(kw_line=kw_line, options=Options())
        setter = OptionSetter(emb)
        setter.set_options()
        return emb.options.neb

    neb = parse("NEB(images=9,preopt=true,ci=true)")
    assert neb.n_images == 9 and neb.preopt and neb.climbing_image
    neb2 = parse("NEB(preopt=false,ci=false,pairs)")
    assert not neb2.preopt and not neb2.climbing_image and neb2.pairs
    neb3 = parse("NEB(pairs=false)")
    assert not neb3.pairs
    import pytest as _pytest

    with _pytest.raises(SyntaxError, match="NEB syntax"):
        parse("NEB(bogus=1)")
