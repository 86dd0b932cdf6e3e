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
# Fallback average molecular moment of inertia (kg m^2) for the free-rotor
# moment composition when the molecule's own moments are unavailable. When
# coordinates are at hand, rrho_thermo uses the molecule's actual mean
# principal moment instead (the reference's I_av, thermochemistry.py:252-254)
# — B_AV only matters for direct vibrational_entropy_qrrho calls without it.
B_AV = 1e-44


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


def vibrational_entropy_qrrho(
    freqs_cm: np.ndarray, T: float, i_av: float | None = None
) -> float:
    """Grimme-interpolated vibrational entropy, kcal/(mol K).

    i_av: the molecule's mean principal moment of inertia (kg m^2) used in
    the free-rotor effective-moment composition mu_eff = mu I_av/(mu + I_av);
    defaults to the generic B_AV when not supplied."""
    nu = freqs_cm[freqs_cm > 0]
    x = _theta(nu) / T
    x = np.clip(x, 1e-12, 500)
    s_ho = R_KCAL * (x / np.expm1(x) - np.log1p(-np.exp(-x)))

    # free-rotor entropy for each mode
    omega = C_CM_S * nu  # 1/s (linear frequency nu*c)
    mu = PLANCK_J_S / (8.0 * np.pi**2 * omega)
    b_av = B_AV if i_av is None else i_av
    mu_eff = mu * b_av / (mu + b_av)
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
    solvent: str | None = None,
) -> float:
    """Sackur-Tetrode S_trans, kcal/(mol K).

    Reference state: gas at P_atm, or solution at concentration C_mol_l with
    the per-molecule volume scaled by the Shakhnovich-Whitesides free-space
    fraction of the named solvent (firecode/thermochemistry.py:71-100;
    solvent None in solution means no free-space reduction).
    """
    m = mass_amu * AMU_KG
    lam = PLANCK_J_S / np.sqrt(2.0 * np.pi * m * KB_J_K * T)  # thermal wavelength, m
    if C_mol_l is not None and P_atm is None:
        # solution reference state: the accessible volume per solute molecule
        # is reduced to the Shakhnovich-Whitesides free space of the bulk
        # solvent (reference thermochemistry.py:71-100, 208-215)
        from firecode_tpu.solvents import free_space_ml_per_l

        free_frac = max(free_space_ml_per_l(solvent) / 1000.0, 1e-9)
        v = free_frac / (C_mol_l * 1000.0 * AVOGADRO)  # m^3 per molecule
    else:
        p = (P_atm or 1.0) * 101325.0
        v = KB_J_K * T / p
    s = R_KCAL * (np.log(v / lam**3) + 5.0 / 2.0)
    return float(s)


def rotational_entropy(
    coords: np.ndarray, atomnos: np.ndarray, T: float, sigma: int = 1
) -> float:
    """Rigid-rotor S_rot with symmetry number, kcal/(mol K).

    Includes the reference's quantum corrections (thermochemistry.py:229-247):
    Herzberg ln(1 + theta/(3T)) for linear rotors and the Euler-Maclaurin
    ln(1 + sum(theta)/(12T)) term for nonlinear ones."""
    from firecode_tpu.prune.oracle import np_inertia_moments

    moments_amu_a2 = np_inertia_moments(coords, atomnos)  # amu A^2
    moments = moments_amu_a2 * AMU_KG * 1e-20  # kg m^2
    if is_linear(coords):
        i_b = moments[-1]
        theta_r = PLANCK_J_S**2 / (8.0 * np.pi**2 * i_b * KB_J_K)
        s = np.log(T / (sigma * theta_r)) + 1.0
        s += np.log(1.0 + theta_r / (3.0 * T))  # Herzberg linear correction
        return float(R_KCAL * s)
    theta = PLANCK_J_S**2 / (8.0 * np.pi**2 * moments.clip(1e-55) * KB_J_K)
    s = np.log(np.pi**0.5 / sigma * (T**3 / np.prod(theta)) ** 0.5) + 3.0 / 2.0
    s += np.log(1.0 + np.sum(theta) / (12.0 * T))  # Euler-Maclaurin correction
    return float(R_KCAL * s)


def rotational_entropy_sweep(
    coords: np.ndarray, atomnos: np.ndarray, T: float, max_sigma: int = 12
) -> list[tuple[int, float]]:
    """T*S_rot (kcal/mol) for sigma = 1..max_sigma — the reference's symmetry
    sweep table (thermochemistry.py:316-340), so a user can correct G for the
    molecule's real symmetry number after the fact."""
    return [
        (sn, T * rotational_entropy(coords, atomnos, T, sigma=sn))
        for sn in range(1, max_sigma + 1)
    ]


def rrho_thermo(
    freqs_cm: np.ndarray,
    coords: np.ndarray,
    atomnos: np.ndarray,
    T: float = 298.15,
    P: float | None = None,
    C: float | None = 0.1,
    sigma: int = 1,
    solvent: str | None = None,
    sweep: bool = False,
) -> dict:
    """Full qRRHO corrections in kcal/mol. Returns components + G_corr;
    with sweep=True also the sigma = 1..12 rotational-entropy table (12
    extra inertia+entropy evaluations — only the freq> artifacts need it,
    not the ensemble free-energy hot loop)."""
    mass = float(np.sum(MASSES[np.asarray(atomnos)]))
    linear = is_linear(coords)
    n_rot_dof = 2 if linear else 3

    zpe = zero_point_energy(freqs_cm)
    e_vib = vibrational_energy(freqs_cm, T)
    e_trans = 1.5 * R_KCAL * T
    e_rot = 0.5 * n_rot_dof * R_KCAL * T
    h_corr = zpe + e_vib + e_trans + e_rot + R_KCAL * T  # +RT: H = U + pV

    # free-rotor composition uses this molecule's actual mean moment
    from firecode_tpu.prune.oracle import np_inertia_moments

    moments = np_inertia_moments(coords, atomnos) * AMU_KG * 1e-20  # kg m^2
    i_av = float(np.mean(moments)) if np.any(moments > 0) else None

    s_vib = vibrational_entropy_qrrho(freqs_cm, T, i_av=i_av)
    s_trans = translational_entropy(
        mass, T, P_atm=P, C_mol_l=C if P is None else None, solvent=solvent
    )
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
        **(
            {"rot_table": rotational_entropy_sweep(coords, atomnos, T)}
            if sweep
            else {}
        ),
    }


def write_orca_mock_out(
    path,
    atomnos: np.ndarray,
    freqs_cm: np.ndarray,
    e_el_kcal: float,
    thermo: dict,
    T: float = 298.15,
    charge: int = 0,
) -> None:
    """ORCA-style .out artifact so downstream tools that grep ORCA outputs
    keep working (reference thermochemistry.py:490-511)."""
    from firecode_tpu.units import EH_TO_KCAL

    e_eh = e_el_kcal / EH_TO_KCAL
    gcorr_eh = thermo["g_corr"] / EH_TO_KCAL
    g_eh = e_eh + gcorr_eh
    h_eh = (e_el_kcal + thermo["h_corr"]) / EH_TO_KCAL
    s_eh_k = (h_eh - g_eh) / T
    rt_eh = R_KCAL * T / EH_TO_KCAL

    lines = [
        "--> What follows mocks an ORCA output:",
        "",
        f"Number of atoms ... {len(np.asarray(atomnos))}",
        f"Total Charge ... ... {charge}",
        "",
        f"Temperature ...: {T:.2f} K ({T - 273.15:.2f} C)",
        "VIBRATIONAL FREQUENCIES",
        "-------------------------------------",
    ]
    for i, f in enumerate(np.asarray(freqs_cm)):
        lines.append(f"  {i:>4}:    {f:4.2f} cm**-1")
    lines += [
        "",
        f"FINAL SINGLE POINT ENERGY {e_eh:.8f} Eh",
        f"FINAL GIBBS FREE ENERGY {g_eh:.8f} Eh",
        f"G-E(el) ... {gcorr_eh:.8f} Eh     {thermo['g_corr']:.2f} kcal/mol",
        "",
        f"Thermal Enthalpy correction ... {rt_eh:.8f} Eh",
        f"Total correction {h_eh - e_eh - rt_eh:.8f} Eh",
        f"Total enthalpy ... {h_eh:.8f} Eh",
        "",
        f"Final entropy term ... {s_eh_k:.8f} Eh/K",
        "",
        "Rotational entropy sweep (T*S_rot, kcal/mol):",
    ]
    for sn, ts_rot in thermo.get("rot_table", []):
        lines.append(f"  sn = {sn:>2}: {ts_rot:10.4f}")
    lines += ["", "*** ORCA TERMINATED NORMALLY ***", ""]
    with open(path, "w") as f:
        f.write("\n".join(lines))


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
        data = rrho_thermo(vib, coords, atomnos, T=T, P=P, C=C, solvent=solvent)
        out[i] = energies[i] + data["g_corr"]
        if logfunction is not None:
            tag = f" ({n_imag} imag)" if n_imag else ""
            logfunction(
                f"  Structure {i + 1:3}: E = {energies[i]:10.3f}, ZPE = "
                f"{data['zpe']:7.3f}, G_corr = {data['g_corr']:8.3f} kcal/mol{tag}"
            )
    return out
