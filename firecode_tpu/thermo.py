"""Quasi-RRHO thermochemistry (Grimme-style) from exact autodiff Hessians.

Capability parity with the reference (firecode/thermochemistry.py:68-363,
609-673): ZPE, translational/rotational/vibrational enthalpy and entropy with
- Grimme's damped free-rotor interpolation for low vibrational modes,
- Sackur-Tetrode translational entropy referenced to gas pressure P or to
  solution concentration C (free-volume correction),
- rigid-rotor rotational entropy with symmetry number,
and a batched `get_free_energies` driver: Hessians for the whole ensemble are
one vmapped device call (firecode_tpu.opt.hessian), not 6N+1 finite-difference
force jobs per structure.

All scalar math is numpy/host — it is O(modes) per structure.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from firecode_tpu.opt.hessian import (
    batch_hessian,
    cleanup_frequencies,
    is_linear,
    mass_weighted_frequencies,
)
from firecode_tpu.pt import MASSES
from firecode_tpu.units import (
    AMU_KG,
    AVOGADRO,
    C_CM_S,
    KB_J_K,
    PLANCK_J_S,
    R_KCAL,
)

J_PER_MOL_TO_KCAL = 1.0 / 4184.0
H_C_KB = PLANCK_J_S * C_CM_S / KB_J_K  # cm * K

FREE_ROTOR_CUTOFF_CM = 100.0  # Grimme interpolation reference frequency
B_AV = 1e-44  # average molecular moment of inertia (kg m^2) for free-rotor


def zero_point_energy(freqs_cm: np.ndarray) -> float:
    """ZPE in kcal/mol from vibrational wavenumbers (imaginary excluded)."""
    nu = freqs_cm[freqs_cm > 0]
    zpe_j_mol = 0.5 * PLANCK_J_S * C_CM_S * np.sum(nu) * AVOGADRO
    return float(zpe_j_mol * J_PER_MOL_TO_KCAL)


def _theta(nu_cm: np.ndarray) -> np.ndarray:
    """Vibrational temperatures (K)."""
    return H_C_KB * nu_cm


def vibrational_energy(freqs_cm: np.ndarray, T: float) -> float:
    """Thermal vibrational energy (beyond ZPE), kcal/mol."""
    nu = freqs_cm[freqs_cm > 0]
    th = _theta(nu)
    x = th / T
    e = R_KCAL * np.sum(th / np.expm1(np.clip(x, 1e-12, 500)))
    return float(e)


def vibrational_entropy_qrrho(freqs_cm: np.ndarray, T: float) -> float:
    """Grimme-interpolated vibrational entropy, kcal/(mol K)."""
    nu = freqs_cm[freqs_cm > 0]
    x = _theta(nu) / T
    x = np.clip(x, 1e-12, 500)
    s_ho = R_KCAL * (x / np.expm1(x) - np.log1p(-np.exp(-x)))

    # free-rotor entropy for each mode
    omega = C_CM_S * nu  # 1/s (linear frequency nu*c)
    mu = PLANCK_J_S / (8.0 * np.pi**2 * omega)
    mu_eff = mu * B_AV / (mu + B_AV)
    s_fr = R_KCAL * (
        0.5
        + np.log(
            np.sqrt(
                8.0 * np.pi**3 * mu_eff * KB_J_K * T / PLANCK_J_S**2
            )
        )
    )

    w = 1.0 / (1.0 + (FREE_ROTOR_CUTOFF_CM / nu) ** 4)
    return float(np.sum(w * s_ho + (1.0 - w) * s_fr))


def translational_entropy(
    mass_amu: float,
    T: float,
    P_atm: float | None = None,
    C_mol_l: float | None = None,
) -> float:
    """Sackur-Tetrode S_trans, kcal/(mol K).

    Reference state: gas at P_atm, or solution at concentration C_mol_l
    (the volume per molecule becomes 1/(C*Na)) — firecode/thermochemistry.py:
    71-100 free-space analog, simplified to the concentration volume.
    """
    m = mass_amu * AMU_KG
    lam = PLANCK_J_S / np.sqrt(2.0 * np.pi * m * KB_J_K * T)  # thermal wavelength, m
    if C_mol_l is not None and P_atm is None:
        v = 1.0 / (C_mol_l * 1000.0 * AVOGADRO)  # m^3 per molecule
    else:
        p = (P_atm or 1.0) * 101325.0
        v = KB_J_K * T / p
    s = R_KCAL * (np.log(v / lam**3) + 5.0 / 2.0)
    return float(s)


def rotational_entropy(
    coords: np.ndarray, atomnos: np.ndarray, T: float, sigma: int = 1
) -> float:
    """Rigid-rotor S_rot with symmetry number, kcal/(mol K)."""
    from firecode_tpu.prune.oracle import np_inertia_moments

    moments_amu_a2 = np_inertia_moments(coords, atomnos)  # amu A^2
    moments = moments_amu_a2 * AMU_KG * 1e-20  # kg m^2
    if is_linear(coords):
        i_b = moments[-1]
        theta_r = PLANCK_J_S**2 / (8.0 * np.pi**2 * i_b * KB_J_K)
        return float(R_KCAL * (np.log(T / (sigma * theta_r)) + 1.0))
    theta = PLANCK_J_S**2 / (8.0 * np.pi**2 * moments.clip(1e-55) * KB_J_K)
    s = R_KCAL * (
        np.log(np.pi**0.5 / sigma * (T**3 / np.prod(theta)) ** 0.5) + 3.0 / 2.0
    )
    return float(s)


def rrho_thermo(
    freqs_cm: np.ndarray,
    coords: np.ndarray,
    atomnos: np.ndarray,
    T: float = 298.15,
    P: float | None = None,
    C: float | None = 0.1,
    sigma: int = 1,
) -> dict[str, float]:
    """Full qRRHO corrections in kcal/mol. Returns components + G_corr."""
    mass = float(np.sum(MASSES[np.asarray(atomnos)]))
    linear = is_linear(coords)
    n_rot_dof = 2 if linear else 3

    zpe = zero_point_energy(freqs_cm)
    e_vib = vibrational_energy(freqs_cm, T)
    e_trans = 1.5 * R_KCAL * T
    e_rot = 0.5 * n_rot_dof * R_KCAL * T
    h_corr = zpe + e_vib + e_trans + e_rot + R_KCAL * T  # +RT: H = U + pV

    s_vib = vibrational_entropy_qrrho(freqs_cm, T)
    s_trans = translational_entropy(mass, T, P_atm=P, C_mol_l=C if P is None else None)
    s_rot = rotational_entropy(coords, atomnos, T, sigma=sigma)
    s_tot = s_vib + s_trans + s_rot

    g_corr = h_corr - T * s_tot
    return {
        "zpe": zpe,
        "h_corr": h_corr,
        "s_vib": s_vib,
        "s_trans": s_trans,
        "s_rot": s_rot,
        "ts": T * s_tot,
        "g_corr": g_corr,
        "n_imag": int(np.sum(freqs_cm < 0)),
    }


def get_free_energies(
    calc,
    atomnos: np.ndarray,
    structures: np.ndarray,
    T: float = 298.15,
    P: float | None = None,
    C: float | None = 0.1,
    solvent: str | None = None,
    expect_ts: bool = False,
    logfunction: Callable[[str], None] | None = None,
) -> np.ndarray:
    """Free energies (kcal/mol) for a whole ensemble: batched Hessians on
    device + per-structure qRRHO on host (firecode/thermochemistry.py:609-673).
    """
    import jax.numpy as jnp

    structures = np.asarray(structures)
    energies = np.asarray(calc.energy(jnp.asarray(structures)))
    hessians = np.asarray(batch_hessian(calc, jnp.asarray(structures)))

    out = np.empty(len(structures))
    for i, (coords, h) in enumerate(zip(structures, hessians)):
        freqs_all, _ = mass_weighted_frequencies(h, atomnos)
        vib, n_imag = cleanup_frequencies(freqs_all, coords, expect_ts=expect_ts)
        data = rrho_thermo(vib, coords, atomnos, T=T, P=P, C=C)
        out[i] = energies[i] + data["g_corr"]
        if logfunction is not None:
            tag = f" ({n_imag} imag)" if n_imag else ""
            logfunction(
                f"  Structure {i + 1:3}: E = {energies[i]:10.3f}, ZPE = "
                f"{data['zpe']:7.3f}, G_corr = {data['g_corr']:8.3f} kcal/mol{tag}"
            )
    return out
