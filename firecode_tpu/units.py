"""Physical constants and unit conversions (CODATA 2018).

Capability parity with the reference's unit table (reference:
firecode/units.py:25-44); values are standard physical constants.
"""

# Lengths
BOHR_TO_ANGSTROM = 0.529177210903
ANGSTROM_TO_BOHR = 1.0 / BOHR_TO_ANGSTROM
ANGSTROM_TO_M = 1e-10
A3_TO_ML = 1e-24

# Energies
EH_TO_EV = 27.211386245988
EH_TO_KCAL = 627.5096080305927  # Hartree -> kcal/mol
EV_TO_KCAL = 23.060541945329334
EV_TO_WAVENUMS = 8065.543937
KCAL_TO_EH = 1.0 / EH_TO_KCAL

# Thermodynamics
R_KCAL = 0.001985877534  # gas constant, kcal/(mol K)
KB_J_K = 1.380649e-23  # Boltzmann, J/K
KB_EV_K = 8.617333262145e-5  # Boltzmann, eV/K
PLANCK_J_S = 6.62607015e-34  # Planck, J s
C_M_S = 2.99792458e8  # speed of light, m/s
C_CM_S = 2.99792458e10  # speed of light, cm/s
AMU_KG = 1.66053906660e-27  # atomic mass unit, kg
AVOGADRO = 6.02214076e23
J_TO_EV = 1.0 / 1.602176634e-19
EV_TO_J = 1.602176634e-19
# vibrational temperature theta(K) per wavenumber(cm^-1): h*c/kB
THETA_PER_CM1_K = 1.438776877
