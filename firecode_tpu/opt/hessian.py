"""Exact Hessians and vibrational frequencies via autodiff.

The reference computes frequencies by ASE finite-difference displacements
(6N+1 force evaluations per structure, firecode/thermochemistry.py:366-445).
Here the Hessian is exact — `jax.hessian` of the calculator energy — and
vmaps across a conformer ensemble, so a whole batch of frequency jobs is one
device call.

Frequency cleanup mirrors the reference semantics (thermochemistry.py:524-589):
the 6 (5 for linear) smallest-|freq| modes are treated as trans/rot and
removed; genuinely imaginary modes (more negative than -25 cm^-1) are kept
and reported negative, with TS handling (keep the single most negative).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from firecode_tpu.calculators.base import Calculator
from firecode_tpu.pt import MASSES

IMAG_THRESHOLD_CM = -25.0  # modes above this (less negative) are noise

# sqrt(kcal/mol/A^2/amu) -> cm^-1 :
#   lambda[SI 1/s^2] = lambda * 4184 / Na / 1e-20 m^2... computed explicitly:
_KCAL = 4184.0  # J per kcal
_NA = 6.02214076e23
_AMU = 1.66053906660e-27
_C_CM = 2.99792458e10
# omega[1/s] = sqrt(lambda * KCAL/NA / (1e-10 m)^2 / AMU); nu~ = omega/(2 pi c)
_FREQ_FACTOR = np.sqrt(_KCAL / _NA / 1e-20 / _AMU) / (2.0 * np.pi * _C_CM)


def batch_hessian(calc: Calculator, coords: jnp.ndarray) -> jnp.ndarray:
    """Exact Hessian(s) of the calculator energy.

    coords: [N, 3] -> [3N, 3N]; [B, N, 3] -> [B, 3N, 3N]. kcal/mol/A^2.
    """
    coords = jnp.asarray(coords)

    def hess_one(c):
        n = c.shape[0]
        flat = c.reshape(-1)
        h = jax.hessian(lambda x: calc.energy_one(x.reshape(n, 3)))(flat)
        return h

    if coords.ndim == 2:
        return hess_one(coords)
    return jax.vmap(hess_one)(coords)


def mass_weighted_frequencies(
    hessian: np.ndarray, atomnos: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Hessian [3N, 3N] -> (frequencies cm^-1 ascending, modes [3N, 3N]).

    Imaginary frequencies are returned as negative numbers.
    """
    masses = MASSES[np.asarray(atomnos)]
    inv_sqrt_m = 1.0 / np.sqrt(np.repeat(masses, 3))
    mw = hessian * inv_sqrt_m[:, None] * inv_sqrt_m[None, :]
    evals, evecs = np.linalg.eigh(mw)
    freqs = np.sign(evals) * np.sqrt(np.abs(evals)) * _FREQ_FACTOR
    return freqs, evecs


def is_linear(coords: np.ndarray, tol: float = 1e-4) -> bool:
    c = coords - coords.mean(axis=0)
    if len(c) < 3:
        return True
    _, s, _ = np.linalg.svd(c)
    return bool(s[1] / max(s[0], 1e-12) < tol)


def cleanup_frequencies(
    freqs: np.ndarray,
    coords: np.ndarray,
    expect_ts: bool = False,
) -> tuple[np.ndarray, int]:
    """Remove trans/rot zero modes; return (vib freqs ascending, n_imag).

    expect_ts: keep the most negative mode as the reaction-coordinate
    imaginary frequency even if other small negatives exist.
    """
    n_zero = 5 if is_linear(coords) else 6
    order = np.argsort(np.abs(freqs))
    zero_ids = set(order[:n_zero].tolist())
    vib = np.array([f for i, f in enumerate(freqs) if i not in zero_ids])
    vib.sort()
    # modes slightly negative due to numerics are flipped positive
    noise = (vib < 0) & (vib > IMAG_THRESHOLD_CM)
    vib[noise] = np.abs(vib[noise])
    n_imag = int(np.sum(vib < 0))
    if expect_ts and n_imag > 1:
        # keep only the most negative as imaginary; flip the rest
        neg_ids = np.where(vib < 0)[0]
        keep = neg_ids[0]
        for i in neg_ids:
            if i != keep:
                vib[i] = abs(vib[i])
        vib.sort()
        n_imag = 1
    return vib, n_imag


def frequencies(
    calc: Calculator,
    atomnos: np.ndarray,
    coords: np.ndarray,
    expect_ts: bool = False,
) -> tuple[np.ndarray, int]:
    """One-call convenience: exact Hessian -> cleaned vib frequencies."""
    h = np.asarray(batch_hessian(calc, jnp.asarray(coords)))
    freqs, _ = mass_weighted_frequencies(h, atomnos)
    return cleanup_frequencies(freqs, np.asarray(coords), expect_ts=expect_ts)
