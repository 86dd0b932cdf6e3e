"""First-order saddle refinement by eigenvector following with exact Hessians.

Replaces the reference's Sella dependency (firecode/ase_manipulations.py:
1182-1345): Sella does order-1 optimization with iteratively-updated internal
coordinates; here the Hessian is exact at every step (jax.hessian of the
calculator) so a plain Cartesian eigenvector-following step with a trust
radius converges reliably for the small/medium systems this pipeline targets.
Also provides an IRC-style downhill relaxation from the saddle along +-the
imaginary mode (reference ase_manipulations.py:1253-1345).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from firecode_tpu.calculators.base import Calculator
from firecode_tpu.opt.hessian import batch_hessian

ZERO_MODE_THR = 1e-3  # kcal/mol/A^2/amu-ish: |eigenvalue| below = trans/rot


class SaddleResult(NamedTuple):
    coords: np.ndarray
    energy: float
    fmax: float
    converged: bool
    n_steps: int


def saddle_refine(
    calc: Calculator,
    coords: np.ndarray,
    fmax: float = 0.05,
    max_steps: int = 200,
    trust_radius: float = 0.1,
    logfunction=None,
) -> SaddleResult:
    """Eigenvector-following to the nearest first-order saddle point."""
    log = logfunction or (lambda s: None)
    x = np.asarray(coords, dtype=np.float64).copy()
    n = x.shape[0]

    for step in range(max_steps):
        e, f = calc.energy_and_forces(jnp.asarray(x))
        g = -np.asarray(f).reshape(-1)  # gradient
        fmax_now = float(np.max(np.linalg.norm(np.asarray(f), axis=-1)))
        if fmax_now < fmax:
            return SaddleResult(x, float(e), fmax_now, True, step)

        h = np.asarray(batch_hessian(calc, jnp.asarray(x)))
        evals, evecs = np.linalg.eigh(h)

        # identify followable modes: skip near-zero (trans/rot) eigenvalues
        live = np.abs(evals) > ZERO_MODE_THR
        live_ids = np.where(live)[0]
        if len(live_ids) == 0:
            break
        mode = live_ids[0]  # lowest live mode = reaction coordinate

        dx = np.zeros(3 * n)
        for i in live_ids:
            gi = g @ evecs[:, i]
            if i == mode:
                # walk uphill along the lowest mode
                denom = abs(evals[i])
                dx += (gi / denom) * evecs[:, i]
            else:
                dx -= (gi / abs(evals[i])) * evecs[:, i]

        norm = np.linalg.norm(dx)
        if norm > trust_radius:
            dx *= trust_radius / norm
        x = x + dx.reshape(n, 3)

        if step % 10 == 0:
            log(
                f"    saddle step {step}: E = {float(e):.3f}, fmax = {fmax_now:.3f}, "
                f"lowest mode = {evals[live_ids[0]]:.1f}"
            )

    e, f = calc.energy_and_forces(jnp.asarray(x))
    fmax_now = float(np.max(np.linalg.norm(np.asarray(f), axis=-1)))
    return SaddleResult(x, float(e), fmax_now, fmax_now < fmax, max_steps)


def irc_relax(
    calc: Calculator,
    saddle_coords: np.ndarray,
    atomnos: np.ndarray,
    displacement: float = 0.1,
    fmax: float = 0.05,
    max_steps: int = 2000,
) -> tuple[np.ndarray, np.ndarray]:
    """Displace along +-the imaginary mode and relax both sides downhill.

    Returns (forward_coords, reverse_coords) — the two connected minima.
    """
    from firecode_tpu.opt.fire import optimize_batch
    from firecode_tpu.opt.hessian import mass_weighted_frequencies

    x = np.asarray(saddle_coords, dtype=np.float64)
    h = np.asarray(batch_hessian(calc, jnp.asarray(x)))
    freqs, modes = mass_weighted_frequencies(h, atomnos)
    # lowest (most negative) frequency mode, un-mass-weighted
    from firecode_tpu.pt import MASSES

    inv_sqrt_m = 1.0 / np.sqrt(np.repeat(MASSES[np.asarray(atomnos)], 3))
    mode = (modes[:, 0] * inv_sqrt_m).reshape(-1, 3)
    mode /= np.linalg.norm(mode)

    pair = np.stack([x + displacement * mode, x - displacement * mode])
    res = optimize_batch(calc, pair, fmax=fmax, max_steps=max_steps)
    out = np.asarray(res.coords, dtype=np.float64)
    return out[0], out[1]
