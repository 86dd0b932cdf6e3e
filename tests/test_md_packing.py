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


# ------------------------------------------------------------ PBC + NPT

def _water_box(n_side=2, spacing=3.1):
    """Grid of water molecules in a cubic box."""
    w = np.array([[0.0, 0, 0.119], [0.0, 0.763, -0.477], [0.0, -0.763, -0.477]])
    frames, z = [], []
    for i in range(n_side):
        for j in range(n_side):
            for k in range(n_side):
                frames.append(w + spacing * np.array([i, j, k]) + 1.0)
                z.extend([8, 1, 1])
    return np.array(z), np.concatenate(frames), n_side * spacing


def test_ff_energy_pbc_minimum_image():
    import jax.numpy as jnp

    from firecode_tpu.calculators.forcefield import LiteFF, ff_energy_pbc

    z, coords, box = _water_box()
    top = LiteFF(z, coords).topology
    e0 = float(ff_energy_pbc(jnp.asarray(coords), top, box))
    # translating ONE whole molecule by a lattice vector leaves the PBC
    # energy unchanged (its image interactions are identical)
    moved = coords.copy()
    moved[:3] += np.array([box, 0.0, 0.0])
    e1 = float(ff_energy_pbc(jnp.asarray(moved), top, box))
    assert abs(e0 - e1) < 1e-3
    # while the open-boundary energy DOES change
    from firecode_tpu.calculators.forcefield import ff_energy

    open0 = float(ff_energy(jnp.asarray(coords), top))
    open1 = float(ff_energy(jnp.asarray(moved), top))
    assert abs(open0 - open1) > 1e-3


def test_npt_berendsen_shrinks_dilute_box():
    from firecode_tpu.calculators.forcefield import LiteFF
    from firecode_tpu.md.equilibration import run_npt_equilibration

    z, coords, box = _water_box(n_side=2, spacing=4.5)  # dilute box
    box = box + 4.0
    top = LiteFF(z, coords).topology
    out, box_out, p_hist = run_npt_equilibration(
        top, z, coords, box, T=150.0, P_atm=1.0, n_steps=300
    )
    assert np.all(np.isfinite(out))
    assert np.all(np.isfinite(p_hist))
    # a dilute LJ/coulomb box is under tension / low pressure: Berendsen
    # shrinks the cell toward the 1 atm target
    assert box_out < box
    # O-H bonds stay intact through the barostat scaling
    for m in range(8):
        o, h1 = out[3 * m], out[3 * m + 1]
        assert np.linalg.norm(o - h1) < 1.4
