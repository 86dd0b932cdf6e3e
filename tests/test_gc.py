"""Native genetic torsion crossing (gc_native>) — md/gc.py.

The reference reaches genetic crossing only through the CREST binary's
iMTD-GC workflow (firecode/interfaces/crest.py:444). Here parent pairs are
crossed in torsion space on device: child = ref + (A - ref) + (B - ref).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from firecode_tpu.sample_molecules import build_alkane


@pytest.fixture(scope="module")
def pentane_torsions():
    atomnos, coords = build_alkane(5)
    from firecode_tpu.md.gc import pool_torsion_setup

    quads, moving = pool_torsion_setup(atomnos, coords)
    assert len(quads) >= 2  # at least the two backbone torsions
    return atomnos, coords, quads, moving


def _wrap(a):
    return a - 360.0 * np.round(np.asarray(a) / 360.0)


def test_apply_targets_reaches_absolute_angles(pentane_torsions):
    """Driving to absolute targets is exact: torsions in a tree commute."""
    from firecode_tpu.md.gc import _apply_targets
    from firecode_tpu.ops.torsion_ops import measure_dihedrals

    _z, coords, quads, moving = pentane_torsions
    t = len(quads)
    ref_angles = np.asarray(measure_dihedrals(jnp.asarray(coords), jnp.asarray(quads)))
    rng = np.random.default_rng(0)
    targets = _wrap(ref_angles[None, :] + rng.uniform(-170, 170, size=(5, t)))
    out = _apply_targets(
        jnp.asarray(coords), jnp.asarray(quads), jnp.asarray(moving),
        jnp.asarray(ref_angles), jnp.asarray(targets), t,
    )
    got = np.asarray(measure_dihedrals(out, jnp.asarray(quads)))
    np.testing.assert_allclose(_wrap(got - targets), 0.0, atol=1e-5)


def test_cross_pool_combines_both_parents(pentane_torsions):
    """Parents gauche on DIFFERENT backbone torsions cross into a child
    gauche on BOTH — the combination neither parent visited."""
    from firecode_tpu.md.gc import cross_pool
    from firecode_tpu.ops.torsion_ops import measure_dihedrals, rotate_dihedral

    _z, coords, quads, moving = pentane_torsions
    c = jnp.asarray(coords)
    p1 = np.asarray(rotate_dihedral(c, jnp.asarray(quads[0]), 120.0, jnp.asarray(moving[0])))
    p2 = np.asarray(rotate_dihedral(c, jnp.asarray(quads[1]), 120.0, jnp.asarray(moving[1])))
    pool = np.stack([coords, p1, p2])

    children = cross_pool(pool, quads, moving)
    assert len(children) >= 1
    ref = np.asarray(measure_dihedrals(c, jnp.asarray(quads)))
    got = np.asarray(measure_dihedrals(jnp.asarray(children), jnp.asarray(quads)))
    d = np.abs(_wrap(got - ref[None, :]))  # [C, T] displacement from ref
    both = (d[:, 0] > 60.0) & (d[:, 1] > 60.0)
    assert both.any(), "no child combines both parents' displacements"


def test_run_gc_discovers_gauche_gauche_pentane():
    """GC on an optimized {anti-anti, g-a, a-g} pentane pool discovers the
    gauche-gauche conformer and grows the pool."""
    from firecode_tpu.calculators.gfnff import GFNFF
    from firecode_tpu.md.gc import pool_torsion_setup, run_gc
    from firecode_tpu.ops.torsion_ops import measure_dihedrals, rotate_dihedral
    from firecode_tpu.opt import optimize_batch

    atomnos, coords = build_alkane(5)
    quads, moving = pool_torsion_setup(atomnos, coords)
    c = jnp.asarray(coords)
    p1 = np.asarray(rotate_dihedral(c, jnp.asarray(quads[0]), 120.0, jnp.asarray(moving[0])))
    p2 = np.asarray(rotate_dihedral(c, jnp.asarray(quads[1]), 120.0, jnp.asarray(moving[1])))
    parents = np.stack([coords, p1, p2])

    calc = GFNFF(atomnos, coords)
    res = optimize_batch(calc, parents, fmax=0.05, max_steps=2000)
    ok = np.asarray(res.converged)
    pool_c = np.asarray(res.coords, dtype=np.float64)[ok]
    pool_e = np.asarray(res.energy, dtype=np.float64)[ok]
    assert len(pool_c) == 3
    order = np.argsort(pool_e, kind="stable")
    pool_c, pool_e = pool_c[order], pool_e[order]

    out_c, out_e, n_new = run_gc(
        calc, atomnos, pool_c, pool_e, maxen=10.0, rmsd_thr=0.25, max_gens=1
    )
    # n_new counts surviving children; net pool size may stay 3 because the
    # MOI dedup merges the g-a / a-g parents (same shape by end-to-end
    # symmetry of pentane) while the new g-g conformer enters
    assert n_new >= 1 and len(out_c) >= 3
    ref = np.asarray(measure_dihedrals(jnp.asarray(pool_c[:1]), jnp.asarray(quads)))[0]
    got = np.asarray(measure_dihedrals(jnp.asarray(out_c), jnp.asarray(quads)))
    d = np.abs(_wrap(got - ref[None, :]))
    assert ((d[:, 0] > 45.0) & (d[:, 1] > 45.0)).any()
    # pool stays sorted and windowed
    assert np.all(np.diff(out_e) >= -1e-9)
    assert out_e[-1] - out_e[0] <= 10.0 + 1e-6


def test_gc_native_operator_registered():
    from firecode_tpu.driver.operators import gc_native_operator, operate  # noqa: F401

    import inspect

    assert "max_children" in inspect.signature(gc_native_operator).parameters


def test_imtd_gc_composition_flags():
    """Both native search drivers compose with the GC stage (iMTD-GC)."""
    import inspect

    from firecode_tpu.driver.operators import (
        goat_native_operator,
        mtd_native_operator,
    )
    from firecode_tpu.md.goat import run_goat

    assert "gc" in inspect.signature(mtd_native_operator).parameters
    assert "gc" in inspect.signature(goat_native_operator).parameters
    assert "gc" in inspect.signature(run_goat).parameters
