"""Native batched GOAT-style global optimizer (goat_native>) — md/goat.py.

The reference reaches global optimization only via the proprietary ORCA GOAT
binary (firecode/interfaces/goat.py:32). Here the uphill/downhill cycle runs
natively: pool-seeded biased walkers, batched FIRE downhill, MAXEN window +
cascade dedup.
"""

import jax
import jax.numpy as jnp
import numpy as np


def test_seeded_history_deposits_after_pool_prefix():
    """Slots [0, p) stay the seeded pool; deposits append at p, p+1, ..."""
    from firecode_tpu.calculators.gfnff import GFNFF, fixtures as fx
    from firecode_tpu.md.metadynamics import _FS, _mtd_run
    from firecode_tpu.pt import MASSES

    z, x = fx.water()
    calc = GFNFF(z, x)
    p, n_dep, n_gauss = 3, 2, 8
    seeds = np.stack([x, x + 0.1, x - 0.1])  # [p, N, 3] known pool
    hist0 = np.zeros((2, n_gauss, len(z), 3))
    hist0[:, :p] = seeds
    x_end, hist, _ = _mtd_run(
        jnp.asarray(np.stack([x, x + 0.05])),
        jnp.asarray(MASSES[z]),
        jax.random.PRNGKey(0),
        jnp.asarray(300.0),
        jnp.asarray(0.5 * _FS),
        jnp.asarray(0.02 / _FS),
        jnp.asarray(2.0),
        jnp.asarray(0.5),
        calc,
        n_dep * 50,
        50,
        n_gauss,
        hist0=jnp.asarray(hist0),
        n_seed=jnp.asarray(p, jnp.int32),
    )
    hist = np.asarray(hist)
    np.testing.assert_allclose(hist[:, :p], hist0[:, :p])  # pool untouched
    assert np.abs(hist[:, p : p + n_dep]).max() > 0  # deposits landed
    np.testing.assert_allclose(hist[:, p + n_dep :], 0.0)  # nothing past them
    assert np.isfinite(np.asarray(x_end)).all()


def test_goat_finds_gauche_and_anti_butane():
    from firecode_tpu.calculators.gfnff import GFNFF, fixtures as fx
    from firecode_tpu.md.goat import run_goat
    from firecode_tpu.ops.algebra import dihedral

    z, x = fx.butane()
    calc = GFNFF(z, x)
    res = run_goat(
        calc, z, x,
        n_walkers=4, max_rounds=3, uphill_steps=600, dep_every=100,
        pool_cap=8, maxen=8.0, seed=3,
    )
    assert len(res.energies) >= 2
    # pool sorted lowest-energy first, all within the MAXEN window
    assert np.all(np.diff(res.energies) >= -1e-9)
    assert res.energies[-1] - res.energies[0] <= 8.0 + 1e-6
    # both backbone basins present: anti (|phi|~180) and gauche (|phi|~65)
    phis = np.abs(
        np.asarray(dihedral(jnp.asarray(res.coords[:, np.array([0, 1, 2, 3])])))
    )
    assert phis.max() > 150.0 and phis.min() < 90.0


def test_goat_native_operator_registered():
    from firecode_tpu.driver.operators import goat_native_operator, operate  # noqa: F401
