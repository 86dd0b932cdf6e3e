"""AIMNet2/UMA gated loaders (reference dispatcher.py:131-185, ase_uma.py:32-78).

The TorchScript escape hatch is exercised for real with a scripted surrogate
model saved to disk (torch-cpu ships in this environment), so the loader,
unit conversion, batching, autograd forces, charge plumbing, and solvation
composition are all tested without redistributing any pretrained weights.
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from firecode_tpu.calculators.aimnet2 import (  # noqa: E402
    TorchScriptMLCalculator,
    load_aimnet2,
    solvate_host,
)
from firecode_tpu.calculators.dispatcher import Dispatcher  # noqa: E402
from firecode_tpu.errors import MissingExternalError  # noqa: E402
from firecode_tpu.units import EV_TO_KCAL  # noqa: E402

from typing import Dict  # noqa: E402


class _Harmonic(torch.nn.Module):
    """AIMNet2-convention surrogate: 0.5*sum((coord-com)^2) + charge, in eV."""

    def forward(self, data: Dict[str, torch.Tensor]) -> Dict[str, torch.Tensor]:
        coord = data["coord"]
        com = coord.mean(dim=1, keepdim=True)
        d = coord - com
        e = 0.5 * (d * d).sum(dim=[1, 2]) + data["charge"]
        return {"energy": e}


def _water():
    atomnos = np.array([8, 1, 1])
    coords = np.array(
        [[0.0, 0.0, 0.119], [0.0, 0.763, -0.477], [0.0, -0.763, -0.477]]
    )
    return atomnos, coords


@pytest.fixture
def model_path(tmp_path):
    path = tmp_path / "surrogate.jpt"
    torch.jit.script(_Harmonic()).save(str(path))
    return str(path)


def _expected_kcal(coords, charge=0.0):
    c = np.asarray(coords, dtype=np.float32)
    if c.ndim == 2:
        c = c[None]
    d = c - c.mean(axis=1, keepdims=True)
    return (0.5 * (d**2).sum(axis=(1, 2)) + charge) * EV_TO_KCAL


def test_torchscript_loader_energy_forces_batched(model_path, monkeypatch):
    monkeypatch.setenv("FIRECODE_TPU_AIMNET2_PATH", model_path)
    atomnos, coords = _water()
    calc = load_aimnet2(atomnos, charge=0.0)
    batch = np.stack([coords, coords + 0.1, coords * 1.05])

    e = calc.energy(batch)
    np.testing.assert_allclose(e, _expected_kcal(batch), rtol=1e-5)

    e2, f = calc.energy_and_forces(batch)
    np.testing.assert_allclose(e2, e, rtol=1e-6)
    # analytic forces of the surrogate: -(coord - com) (mean-free already)
    d = batch - batch.mean(axis=1, keepdims=True)
    np.testing.assert_allclose(f, -d * EV_TO_KCAL, rtol=1e-4, atol=1e-5)

    # single-structure squeeze path
    e1, f1 = calc.energy_and_forces(coords)
    assert e1.shape == ()
    np.testing.assert_allclose(e1, e[0], rtol=1e-6)
    np.testing.assert_allclose(f1, f[0], rtol=1e-6)


def test_charge_is_plumbed(model_path):
    atomnos, coords = _water()
    model = torch.jit.load(model_path)
    calc = TorchScriptMLCalculator(model, atomnos, charge=-1.0)
    e = calc.energy(coords[None])
    np.testing.assert_allclose(e, _expected_kcal(coords, charge=-1.0), rtol=1e-5)


def test_energy_unit_conversion(model_path):
    atomnos, coords = _water()
    model = torch.jit.load(model_path)
    kcal = TorchScriptMLCalculator(model, atomnos, energy_unit="kcal")
    ev = TorchScriptMLCalculator(model, atomnos, energy_unit="ev")
    np.testing.assert_allclose(
        np.asarray(ev.energy(coords[None])),
        np.asarray(kcal.energy(coords[None])) * EV_TO_KCAL,
        rtol=1e-6,
    )
    with pytest.raises(ValueError):
        TorchScriptMLCalculator(model, atomnos, energy_unit="joules")


def test_dispatcher_aimnet2_and_solvation(model_path, monkeypatch):
    monkeypatch.setenv("FIRECODE_TPU_AIMNET2_PATH", model_path)
    atomnos, coords = _water()
    gas = Dispatcher("AIMNET2").get_batch_calc(atomnos, coords)
    solv = Dispatcher("AIMNET2").get_batch_calc(atomnos, coords, solvent="water")

    batch = np.stack([coords, coords + 0.05])
    from firecode_tpu.calculators.solvation import solvation_energy_fn
    import jax

    fn = jax.vmap(solvation_energy_fn(atomnos, "water", 0.0))
    delta = np.asarray(fn(batch.astype(np.float64)))
    np.testing.assert_allclose(
        np.asarray(solv.energy(batch)),
        np.asarray(gas.energy(batch)) + delta,
        rtol=1e-5,
        atol=1e-6,
    )
    # solvated forces = gas forces - grad(delta): check against finite diff
    e0, f0 = solv.energy_and_forces(batch)
    h = 1e-4
    dplus = batch.copy()
    dplus[0, 0, 2] += h
    dminus = batch.copy()
    dminus[0, 0, 2] -= h
    fd = -(solv.energy(dplus)[0] - solv.energy(dminus)[0]) / (2 * h)
    np.testing.assert_allclose(f0[0, 0, 2], fd, rtol=2e-3, atol=1e-4)


def test_missing_weights_gate(monkeypatch):
    monkeypatch.delenv("FIRECODE_TPU_AIMNET2_PATH", raising=False)
    atomnos, coords = _water()
    with pytest.raises(MissingExternalError, match="AIMNET2"):
        Dispatcher("AIMNET2").get_batch_calc(atomnos, coords)


def test_bad_path_gate(monkeypatch, tmp_path):
    monkeypatch.setenv("FIRECODE_TPU_AIMNET2_PATH", str(tmp_path / "missing.jpt"))
    atomnos, coords = _water()
    with pytest.raises(FileNotFoundError, match="AIMNet2"):
        load_aimnet2(atomnos)


def test_uma_gate():
    pytest.importorskip("fairchem", reason="fairchem not installed (gated)")


def test_fire_optimizes_on_torchscript_surface(model_path, monkeypatch):
    """The host ML calculator drives the batched FIRE loop like XTBHost."""
    monkeypatch.setenv("FIRECODE_TPU_AIMNET2_PATH", model_path)
    atomnos, coords = _water()
    calc = load_aimnet2(atomnos)
    from firecode_tpu.opt.fire import optimize_batch

    batch = np.stack([coords * 1.3, coords * 0.8])
    out = optimize_batch(calc, batch, fmax=1e-3, max_steps=400)
    final = np.asarray(out.coords)
    # the surrogate's minimum collapses every atom onto the centroid
    d = final - final.mean(axis=1, keepdims=True)
    assert np.abs(d).max() < 0.05
    assert bool(np.all(np.asarray(out.converged)))
