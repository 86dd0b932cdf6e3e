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

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from firecode_tpu.calculators.base import Calculator
from firecode_tpu.opt.hessian import batch_hessian

ZERO_MODE_THR = 1e-3  # kcal/mol/A^2/amu-ish: |eigenvalue| below = trans/rot


class SaddleResult(NamedTuple):
    coords: np.ndarray
    energy: float
    fmax: float
    converged: bool
    n_steps: int


class SaddleBatchResult(NamedTuple):
    coords: np.ndarray  # [B, N, 3]
    energies: np.ndarray  # [B]
    fmax: np.ndarray  # [B]
    converged: np.ndarray  # bool[B]
    n_steps: int


@partial(jax.jit, static_argnames=("calc",))
def _saddle_ef_jit(coords_b, fmax_thr, trust_radius, calc: Calculator, max_steps: int):
    """Batched eigenvector-following: whole TS ensemble in one jitted loop.

    Every lane takes an exact-Hessian EF step each iteration (batched
    jax.hessian + batched eigh); converged lanes freeze via masks. This
    replaces the per-structure host loop the round-1 review flagged — an
    ensemble of saddle candidates is now one device program.
    """
    b, n, _ = coords_b.shape
    dim = 3 * n

    def hessians(x):
        return jax.vmap(lambda c: jax.hessian(calc.energy_one)(c).reshape(dim, dim))(x)

    def lane_fmax(f):
        return jnp.max(jnp.sqrt(jnp.sum(f * f, axis=-1)), axis=-1)  # [B]

    def step_fn(state):
        x, f, steps = state
        done = lane_fmax(f) < fmax_thr

        g = -f.reshape(b, dim)
        h = hessians(x)
        evals, evecs = jnp.linalg.eigh(h)  # [B, dim], [B, dim, dim]
        live = jnp.abs(evals) > ZERO_MODE_THR
        # lowest live eigenvalue = reaction coordinate, followed uphill
        mode = jnp.argmin(jnp.where(live, evals, jnp.inf), axis=-1)  # [B]
        gi = jnp.einsum("bd,bdi->bi", g, evecs)
        denom = jnp.maximum(jnp.abs(evals), ZERO_MODE_THR)
        sign = jnp.where(jnp.arange(dim)[None, :] == mode[:, None], 1.0, -1.0)
        coeff = jnp.where(live, sign * gi / denom, 0.0)
        dx = jnp.einsum("bi,bdi->bd", coeff, evecs)
        norm = jnp.sqrt(jnp.sum(dx * dx, axis=-1, keepdims=True)) + 1e-12
        dx = dx * jnp.minimum(1.0, trust_radius / norm)
        dx = jnp.where(done[:, None], 0.0, dx)

        x = x + dx.reshape(b, n, 3)
        _, f_new = calc.energy_and_forces(x)
        return x, f_new, steps + 1

    def cond(state):
        _, f, steps = state
        return (steps < max_steps) & jnp.any(lane_fmax(f) >= fmax_thr)

    _, f0 = calc.energy_and_forces(coords_b)
    x, f, steps = lax.while_loop(cond, step_fn, (coords_b, f0, jnp.asarray(0, jnp.int32)))
    e = calc.energy(x)
    fm = lane_fmax(f)
    return x, e, fm, fm < fmax_thr, steps


def saddle_refine_batch(
    calc: Calculator,
    coords: np.ndarray,
    fmax: float = 0.05,
    max_steps: int = 200,
    trust_radius: float = 0.1,
) -> SaddleBatchResult:
    """Refine a whole batch [B, N, 3] of saddle candidates in one device call."""
    coords_b = jnp.asarray(np.asarray(coords, dtype=np.float64))
    x, e, fm, conv, steps = _saddle_ef_jit(
        coords_b,
        jnp.asarray(fmax, coords_b.dtype),
        jnp.asarray(trust_radius, coords_b.dtype),
        calc,
        max_steps,
    )
    return SaddleBatchResult(
        coords=np.asarray(x, dtype=np.float64),
        energies=np.asarray(e, dtype=np.float64),
        fmax=np.asarray(fm, dtype=np.float64),
        converged=np.asarray(conv),
        n_steps=int(steps),
    )


def saddle_refine(
    calc: Calculator,
    coords: np.ndarray,
    fmax: float = 0.05,
    max_steps: int = 200,
    trust_radius: float = 0.1,
    logfunction=None,
) -> SaddleResult:
    """Eigenvector-following to the nearest first-order saddle point."""
    res = saddle_refine_batch(
        calc, np.asarray(coords)[None], fmax=fmax, max_steps=max_steps, trust_radius=trust_radius
    )
    if logfunction is not None:
        logfunction(
            f"    saddle refine: E = {res.energies[0]:.3f}, fmax = {res.fmax[0]:.3f} "
            f"after {res.n_steps} steps"
        )
    return SaddleResult(
        coords=res.coords[0],
        energy=float(res.energies[0]),
        fmax=float(res.fmax[0]),
        converged=bool(res.converged[0]),
        n_steps=res.n_steps,
    )


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
