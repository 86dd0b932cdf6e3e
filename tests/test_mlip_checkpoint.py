import numpy as np
import jax.numpy as jnp

from firecode_tpu.calculators import LiteFF
from firecode_tpu.calculators.mlip import MLIPCalculator, distill, init_params
from tests.test_calculator_opt import WATER, WATER_Z


def test_mlip_inference_batched(rng):
    import jax

    params = init_params(jax.random.PRNGKey(0))
    calc = MLIPCalculator(params, WATER_Z)
    batch = jnp.asarray(np.stack([WATER, WATER + 0.05]).astype(np.float32))
    e, f = calc.energy_and_forces(batch)
    assert e.shape == (2,)
    assert f.shape == (2, 3, 3)
    assert np.all(np.isfinite(np.asarray(f)))
    # invariance: rotated+translated structure gives identical energy
    from scipy.spatial.transform import Rotation

    rot = Rotation.random(random_state=1).as_matrix().astype(np.float32)
    moved = WATER.astype(np.float32) @ rot.T + 3.0
    e0 = float(calc.energy(jnp.asarray(WATER.astype(np.float32))))
    e1 = float(calc.energy(jnp.asarray(moved)))
    assert abs(e0 - e1) < 1e-3


def test_mlip_distillation_reduces_error(rng):
    teacher = LiteFF(WATER_Z, WATER)
    student = distill(
        teacher, WATER_Z, WATER, n_samples=64, n_steps=200, jitter=0.1
    )
    # student should roughly track teacher energies on held-out geometries
    test_geoms = jnp.asarray(
        (WATER[None] + rng.normal(scale=0.08, size=(16, 3, 3))).astype(np.float32)
    )
    e_t = np.asarray(teacher.energy(test_geoms))
    e_s = np.asarray(student.energy(test_geoms))
    # correlation between teacher and student across geometries
    corr = np.corrcoef(e_t, e_s)[0, 1]
    assert corr > 0.7, corr


def test_mlip_save_load(tmp_path, rng):
    import jax

    params = init_params(jax.random.PRNGKey(1))
    calc = MLIPCalculator(params, WATER_Z)
    path = str(tmp_path / "mlip.npz")
    calc.save(path)
    loaded = MLIPCalculator.load(path, WATER_Z)
    x = jnp.asarray(WATER.astype(np.float32))
    assert float(calc.energy(x)) == float(loaded.energy(x))


def test_run_state_checkpoint_roundtrip(tmp_path, rng):
    from types import SimpleNamespace

    from firecode_tpu.driver.checkpoint import load_state, save_state

    emb = SimpleNamespace(
        stamp="t",
        structures=rng.normal(size=(5, 4, 3)),
        atomnos=np.array([6, 6, 1, 1], dtype=np.int32),
        energies=np.arange(5.0),
        exit_status=np.array([True, True, False, True, True]),
        constrained_indices=np.zeros((5, 1, 2), dtype=int),
    )
    path = save_state(emb, "post_optimization", tmp_path / "state.npz")
    emb2 = SimpleNamespace(stamp="t2")
    stage = load_state(emb2, path)
    assert stage == "post_optimization"
    np.testing.assert_array_equal(emb2.structures, emb.structures)
    np.testing.assert_array_equal(emb2.energies, emb.energies)
    np.testing.assert_array_equal(emb2.exit_status, emb.exit_status)
