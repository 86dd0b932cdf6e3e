"""Solvent name normalization + dielectric data.

Capability parity with the reference's solvent tables (firecode/solvents.py:
31-226): synonym resolution, dielectric constants for implicit-solvation
models, and basic physical data used by thermochemistry free-volume terms.
"""

from __future__ import annotations

# synonym -> canonical name
solvent_synonyms: dict[str, str] = {
    "ch2cl2": "dcm",
    "dichloromethane": "dcm",
    "methylenechloride": "dcm",
    "chcl3": "chloroform",
    "ch3cn": "acetonitrile",
    "mecn": "acetonitrile",
    "acn": "acetonitrile",
    "meoh": "methanol",
    "etoh": "ethanol",
    "iproh": "2-propanol",
    "ipa": "2-propanol",
    "h2o": "water",
    "dmso": "dmso",
    "dimethylsulfoxide": "dmso",
    "dmf": "dmf",
    "dimethylformamide": "dmf",
    "thf": "thf",
    "tetrahydrofuran": "thf",
    "et2o": "diethylether",
    "ether": "diethylether",
    "ccl4": "carbontetrachloride",
    "c6h6": "benzene",
    "phh": "benzene",
    "phme": "toluene",
    "tol": "toluene",
    "hex": "hexane",
    "n-hexane": "hexane",
    "ace": "acetone",
    "etoac": "ethylacetate",
    "ea": "ethylacetate",
}

# canonical name -> dielectric constant (25 C)
epsilon_dict: dict[str, float] = {
    "acetone": 20.7,
    "acetonitrile": 37.5,
    "benzene": 2.28,
    "carbontetrachloride": 2.24,
    "chloroform": 4.81,
    "dcm": 8.93,
    "diethylether": 4.33,
    "dmf": 36.7,
    "dmso": 46.7,
    "ethanol": 24.5,
    "ethylacetate": 6.02,
    "hexane": 1.88,
    "methanol": 32.7,
    "2-propanol": 17.9,
    "thf": 7.58,
    "toluene": 2.38,
    "water": 78.4,
}

# canonical name -> (molar mass g/mol, density g/mL) for free-volume terms
physical_data: dict[str, tuple[float, float]] = {
    "acetone": (58.08, 0.791),
    "acetonitrile": (41.05, 0.786),
    "benzene": (78.11, 0.877),
    "carbontetrachloride": (153.82, 1.594),
    "chloroform": (119.38, 1.489),
    "dcm": (84.93, 1.327),
    "diethylether": (74.12, 0.713),
    "dmf": (73.09, 0.944),
    "dmso": (78.13, 1.100),
    "ethanol": (46.07, 0.789),
    "ethylacetate": (88.11, 0.902),
    "hexane": (86.18, 0.659),
    "methanol": (32.04, 0.792),
    "2-propanol": (60.10, 0.786),
    "thf": (72.11, 0.889),
    "toluene": (92.14, 0.867),
    "water": (18.02, 0.997),
}


def normalize_solvent(name: str | None) -> str | None:
    if name is None:
        return None
    name = name.lower().strip()
    return solvent_synonyms.get(name, name)


def get_epsilon(name: str) -> float:
    canonical = normalize_solvent(name)
    if canonical not in epsilon_dict:
        raise KeyError(f"Unknown solvent {name!r}; known: {sorted(epsilon_dict)}")
    return epsilon_dict[canonical]


# canonical name -> the name the xtb/crest binaries expect (ALPB/GBSA tables)
# (reference: firecode/solvents.py to_xtb_solvents role)
xtb_solvent_names: dict[str, str] = {
    "dcm": "ch2cl2",
    "chloroform": "chcl3",
    "acetonitrile": "acetonitrile",
    "acetone": "acetone",
    "benzene": "benzene",
    "carbontetrachloride": "ccl4",
    "diethylether": "ether",
    "dmf": "dmf",
    "dmso": "dmso",
    "ethanol": "ethanol",
    "ethylacetate": "ethylacetate",
    "hexane": "hexane",
    "methanol": "methanol",
    "2-propanol": "2-propanol",
    "thf": "thf",
    "toluene": "toluene",
    "water": "water",
}


def get_xtb_solvent_name(name: str) -> str:
    """Solvent string for xtb/crest command lines (falls back to the input)."""
    canonical = normalize_solvent(name)
    return xtb_solvent_names.get(canonical, canonical)


# Shakhnovich-Whitesides free-space data: canonical name -> (molarity mol/L,
# molecular volume A^3). Experimental values where available (reference
# firecode/solvents.py:86-120 / organicchemistrydata.org); other solvents
# fall back to bulk values derived from physical_data.
free_space_data: dict[str, tuple[float, float]] = {
    "water": (55.6, 27.944),
    "toluene": (9.4, 149.070),
    "dmf": (12.9, 77.442),
    "chloroform": (12.5, 97.0),
}

AVOGADRO_NA = 6.02214076e23


def free_space_ml_per_l(solvent: str | None) -> float:
    """Accessible free space (mL per L of bulk solvent) for a solute.

    Shakhnovich & Whitesides, J. Org. Chem. 1998, 63, 3821: the free volume
    per solvent molecule is v_free = 8 (d - v_m^(1/3))^3 with d the average
    intermolecular spacing (1e27/(M Na))^(1/3) A. None -> 1000 (whole liter,
    i.e. no correction). Note: for solvents without tabulated data the
    molarity is 1000 * density / MW (the reference's estimator at
    solvents.py:216-217 inverts this ratio; we use the dimensionally correct
    form)."""
    if not solvent:
        return 1000.0
    canonical = normalize_solvent(solvent)
    if canonical in free_space_data:
        molarity, mol_volume = free_space_data[canonical]
    elif canonical in physical_data:
        mw, density = physical_data[canonical]
        molarity = 1000.0 * density / mw
        # bulk volume would make spacing == size (zero free space by
        # construction); estimate the vdW molecular volume with a typical
        # liquid packing coefficient of 0.6
        mol_volume = 0.6 * mw / density / AVOGADRO_NA * 1e24  # A^3 per molecule
    else:
        raise KeyError(
            f"Unknown solvent {solvent!r} for quasi-RRHO free-space; known: "
            f"{sorted(set(free_space_data) | set(physical_data))}"
        )
    spacing = (1e27 / (molarity * AVOGADRO_NA)) ** (1.0 / 3.0)
    gap = max(spacing - mol_volume ** (1.0 / 3.0), 0.02)  # floor: avoid log(0)
    v_free = 8.0 * gap**3  # A^3 per molecule
    return float(v_free * molarity * AVOGADRO_NA * 1e-24)  # mL per L
