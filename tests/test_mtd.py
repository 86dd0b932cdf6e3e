"""Native batched metadynamics (mtd_native>) — VERDICT r2 item 10.

The reference outsources MTD to the CREST binary; here W biased walkers run
as one batched device program with per-walker RMSD-Gaussian histories.
"""

import numpy as np
import jax.numpy as jnp


def test_mtd_explores_torsion_space_and_keeps_molecule_intact():
    from firecode_tpu.calculators.gfnff import GFNFF, fixtures as fx
    from firecode_tpu.md.metadynamics import run_mtd
    from firecode_tpu.ops.algebra import dihedral

    z, x = fx.butane()
    calc = GFNFF(z, x)
    pool = run_mtd(calc, z, x, n_walkers=3, n_steps=1200, dep_every=100, seed=1)
    assert pool.shape == (3 * 13, len(z), 3)
    assert np.isfinite(pool).all()
    # molecule intact in every snapshot (no bond scrambles at 500 K + bias)
    for i, j in ((0, 1), (1, 2), (2, 3)):
        d = np.linalg.norm(pool[:, i] - pool[:, j], axis=-1)
        assert d.max() < 1.9 and d.min() > 1.2
    # the bias actually drives basin hopping: the backbone dihedral leaves
    # the starting anti basin and reaches gauche territory
    phis = np.abs(np.asarray(dihedral(jnp.asarray(pool)[:, np.array([0, 1, 2, 3])])))
    assert phis.max() - phis.min() > 90.0


def test_mtd_bias_is_smooth_at_deposited_center():
    """The rmsd^2 formulation: finite bias force exactly ON a reference."""
    import jax

    from firecode_tpu.calculators.gfnff import fixtures as fx
    from firecode_tpu.md.metadynamics import _bias_energy

    _, x = fx.water()
    hist = jnp.asarray(np.stack([x, x + 5.0]))
    g = jax.grad(
        lambda c: _bias_energy(c, hist, 2, 3.0, 0.6, 2)
    )(jnp.asarray(x))
    assert np.isfinite(np.asarray(g)).all()


def test_mtd_native_operator_registered():
    from firecode_tpu.driver.operators import mtd_native_operator, operate  # noqa: F401
