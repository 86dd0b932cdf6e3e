"""Mesh-sharded metadynamics walkers.

Walkers never interact (no cross-walker reduction exists in the MTD
program), so sharding the walker axis over the "ens" mesh is pure scaling:
with an unpadded walker count the sharded run is the SAME program on the
same RNG stream and must reproduce the single-device trajectories exactly.
The reference runs MTD one CREST process per trajectory
(firecode/interfaces/crest.py:444) — multi-chip walker farming has no
counterpart there.
"""

import numpy as np
import pytest

# heavy e2e module: excluded from the fast default
# selection (pytest -m '' runs everything)
pytestmark = pytest.mark.slow

import pytest

from firecode_tpu.sample_molecules import build_alkane


@pytest.fixture(scope="module")
def butane_calc():
    from firecode_tpu.calculators.gfnff import GFNFF

    atomnos, coords = build_alkane(4)
    return atomnos, coords, GFNFF(atomnos, coords)


def _mesh(n):
    from firecode_tpu.parallel import ensemble_mesh

    return ensemble_mesh(n)


def test_sharded_mtd_matches_single_device(butane_calc):
    """8 walkers over 8 devices == 8 walkers on one device, exactly."""
    from firecode_tpu.md.metadynamics import run_mtd

    atomnos, coords, calc = butane_calc
    kw = dict(
        n_walkers=8, n_steps=60, dep_every=20, temperature=400.0, seed=3
    )
    ref = run_mtd(calc, atomnos, coords, **kw)
    out = run_mtd(calc, atomnos, coords, mesh=_mesh(8), **kw)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_sharded_mtd_pads_walkers(butane_calc):
    """A walker count not divisible by the device count pads then slices:
    output keeps exactly W * n_dep snapshots, all finite."""
    from firecode_tpu.md.metadynamics import run_mtd

    atomnos, coords, calc = butane_calc
    out = run_mtd(
        calc, atomnos, coords, n_walkers=6, n_steps=60, dep_every=20,
        mesh=_mesh(4), seed=5,
    )
    n_dep = 60 // 20 + 1
    assert out.shape == (6 * n_dep, len(atomnos), 3)
    assert np.all(np.isfinite(out))


def test_sharded_goat_runs(butane_calc):
    """run_goat with a mesh threads sharding through uphill + downhill and
    still recovers the butane anti/gauche basins."""
    from firecode_tpu.md.goat import run_goat

    atomnos, coords, calc = butane_calc
    res = run_goat(
        calc, atomnos, coords, n_walkers=4, max_rounds=3, uphill_steps=600,
        dep_every=100, pool_cap=8, maxen=8.0, rmsd_thr=0.25, seed=3,
        mesh=_mesh(4),
    )
    assert len(res.coords) >= 2  # anti + gauche
    assert np.all(np.diff(res.energies) >= -1e-9)
