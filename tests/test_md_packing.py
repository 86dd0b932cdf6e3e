import numpy as np
import pytest
from types import SimpleNamespace

from firecode_tpu.calculators import LiteFF
from firecode_tpu.md.equilibration import check_solvent_scramble, run_md_equilibration
from tests.test_calculator_opt import WATER, WATER_Z


def test_md_equilibration_nvt(rng):
    calc = LiteFF(WATER_Z, WATER)
    out = run_md_equilibration(
        calc, WATER_Z, WATER, T=300.0, n_steps=200, dt_fs=0.5
    )
    assert out.shape == WATER.shape
    assert np.all(np.isfinite(out))
    # molecule held together by the FF
    d_oh = np.linalg.norm(out[0] - out[1])
    assert 0.7 < d_oh < 1.4


def test_md_frozen_atoms(rng):
    calc = LiteFF(WATER_Z, WATER)
    out = run_md_equilibration(
        calc, WATER_Z, WATER, T=300.0, n_steps=100, frozen_atoms=[0]
    )
    np.testing.assert_allclose(out[0], WATER[0], atol=1e-6)
    assert not np.allclose(out[1], WATER[1], atol=1e-6)


def test_solvent_scramble_check():
    box = np.concatenate([WATER, WATER + 10.0])
    assert check_solvent_scramble(WATER, box, n_solute=3)
    scrambled = box.copy()
    scrambled[0] += 5.0
    assert not check_solvent_scramble(WATER, scrambled, n_solute=3)


def test_native_packing(tmp_path, rng):
    """The packmol-free packing kernel produces a clash-relaxed box."""
    import os

    from firecode_tpu.embed import Hypermolecule
    from firecode_tpu.interfaces.packmol import _native_pack

    old = os.getcwd()
    os.chdir(tmp_path)
    try:
        mol = Hypermolecule(atomnos=WATER_Z, coords=WATER, name="solute.xyz")
        embedder = SimpleNamespace(log=lambda s, p=True: None)
        out = _native_pack(mol, "water", edge=8.0, n_solvent=3, embedder=embedder)
        assert (tmp_path / out).exists()
        from firecode_tpu.io.xyz import read_xyz

        atoms, coords, _ = read_xyz(out)
        assert len(atoms) == 3 + 3 * 3  # solute + 3 waters
        # no catastrophic overlaps after relaxation
        from scipy.spatial.distance import cdist

        d = cdist(coords[0], coords[0])
        np.fill_diagonal(d, 10.0)
        assert d.min() > 0.5
    finally:
        os.chdir(old)
