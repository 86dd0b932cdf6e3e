import numpy as np
import jax.numpy as jnp
import pytest

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


# ------------------------------------------------ bundled CHNO checkpoint


def _bundled_teacher(z, coords):
    """The teacher the bundled checkpoint was actually distilled from,
    read from its __teacher__ metadata (provenance, VERDICT r2 item 2)."""
    from firecode_tpu.calculators.mlip import DEFAULT_CHECKPOINT, pick_teacher

    with np.load(DEFAULT_CHECKPOINT) as data:
        name = str(data["__teacher__"]) if "__teacher__" in data.files else "liteff-r"
    _, factory = pick_teacher(name)
    return name, factory(z, coords)


def test_bundled_checkpoint_records_noncircular_teacher():
    """The round-2 checkpoint was circularly distilled from the homebrew
    LiteFF-R; the shipped one must record a better teacher (the native
    literature-anchored GFN-FF, or real xtb when available)."""
    from firecode_tpu.calculators.mlip import DEFAULT_CHECKPOINT

    with np.load(DEFAULT_CHECKPOINT) as data:
        assert "__teacher__" in data.files
        assert str(data["__teacher__"]) in ("gfnff", "xtb")


def test_bundled_checkpoint_validates_against_teacher(rng):
    """VERDICT round-1 item 9 + r2 item 2: validation MAE vs the RECORDED
    teacher; near the training region the student must track it closely."""
    from firecode_tpu.calculators.mlip import load_mlip

    # methanol, in the training set (teacher-relaxed region)
    z = np.array([6, 8, 1, 1, 1, 1])
    meoh = np.array(
        [[0.0, 0, 0], [1.42, 0, 0], [1.75, 0.89, 0],
         [-0.38, 0.51, 0.89], [-0.38, 0.51, -0.89], [-0.38, -1.02, 0]]
    )
    from firecode_tpu.opt.fire import optimize_batch

    _, teacher = _bundled_teacher(z, meoh)
    # relax with the native GFN-FF (a host xtb teacher cannot run inside the
    # jitted FIRE loop); the teacher labels the evaluation geometries
    from firecode_tpu.calculators.gfnff import GFNFF

    relaxed = np.asarray(
        optimize_batch(GFNFF(z, meoh), meoh[None].astype(np.float64), fmax=0.05, max_steps=2000).coords[0]
    )
    student = load_mlip(z)
    geoms = jnp.asarray(
        (relaxed[None] + rng.normal(scale=0.08, size=(24, 6, 3))).astype(np.float32)
    )
    e_t = np.asarray(teacher.energy(geoms))
    e_s = np.asarray(student.energy(geoms))
    mae = float(np.abs(e_s - e_t).mean())
    corr = float(np.corrcoef(e_t, e_s)[0, 1])
    assert mae < 15.0, f"MAE vs teacher too high: {mae:.2f} kcal/mol"
    assert corr > 0.85, f"correlation vs teacher too low: {corr:.3f}"


def test_bundled_checkpoint_transfers_to_held_out_composition(rng):
    """Dimethyl ether (C2H6O, a connectivity NOT in the training set) must
    still correlate with the teacher — element-transferable descriptors."""
    from firecode_tpu.calculators.mlip import load_mlip
    from firecode_tpu.opt.fire import optimize_batch

    z = np.array([6, 8, 6, 1, 1, 1, 1, 1, 1])
    dme = np.array(
        [[0.0, 0, 0], [1.41, 0, 0], [2.03, 1.27, 0],
         [-0.4, -0.5, 0.89], [-0.4, -0.5, -0.89], [-0.37, 1.02, 0],
         [3.1, 1.1, 0], [1.74, 1.86, 0.89], [1.74, 1.86, -0.89]]
    )
    _, teacher = _bundled_teacher(z, dme)
    from firecode_tpu.calculators.gfnff import GFNFF

    relaxed = np.asarray(
        optimize_batch(GFNFF(z, dme), dme[None].astype(np.float64), fmax=0.05, max_steps=2000).coords[0]
    )
    student = load_mlip(z)
    geoms = jnp.asarray(
        (relaxed[None] + rng.normal(scale=0.06, size=(24, 9, 3))).astype(np.float32)
    )
    e_t = np.asarray(teacher.energy(geoms))
    e_s = np.asarray(student.energy(geoms))
    corr = float(np.corrcoef(e_t, e_s)[0, 1])
    assert corr > 0.7, f"held-out correlation too low: {corr:.3f}"


def test_calc_mlip_through_dispatcher():
    from firecode_tpu.calculators.dispatcher import Dispatcher

    z = np.array([8, 1, 1])
    w = np.array([[0.0, 0, 0.119], [0.0, 0.763, -0.477], [0.0, -0.763, -0.477]])
    calc = Dispatcher("MLIP").get_batch_calc(z, w[None])
    assert calc.name == "mlip"
    e, f = calc.energy_and_forces(jnp.asarray(np.stack([w, w + 0.02]), jnp.float32))
    assert e.shape == (2,) and f.shape == (2, 3, 3)
    assert np.all(np.isfinite(np.asarray(f)))


def test_mlip_missing_checkpoint_gate(monkeypatch, tmp_path):
    from firecode_tpu.calculators.mlip import load_mlip
    from firecode_tpu.errors import MissingExternalError

    monkeypatch.setenv("FIRECODE_TPU_MLIP_PATH", str(tmp_path / "nope.npz"))
    with pytest.raises(MissingExternalError, match="checkpoint"):
        load_mlip(np.array([8, 1, 1]))
