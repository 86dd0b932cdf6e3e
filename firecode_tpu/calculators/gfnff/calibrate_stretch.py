"""Calibrate the Morse stretch table against literature force constants.

The GFN-FF bond well is d = kb_s * sf * (1 + kb_pi*BO) with curvature
k = 2 d a^2, a = kb_a / r0. This script solves the per-element stretch
factors sf_X (sf = sqrt(sf_i sf_j)) and the pi stiffening kb_pi by least
squares against experimental stretching force constants (mdyn/A, from vibrational analyses
of the same small molecules the geometry anchors use). BOND_F — which also
sets ANGLE stiffness — is left alone; the stretch table is separate so
recalibrating curvature cannot silently re-tune bends.

An EN^2 softening term was tried and solved to exactly zero — the
per-element factors absorb polarity. The solved values are committed as
_STRETCH_F / kb_pi in params.py + data/gfnff_fit.npz; re-run after changing the bond-length
model:  python -m firecode_tpu.calculators.gfnff.calibrate_stretch

Mirrors the role of the reference's published GFN-FF force-constant tables
(/root/reference/firecode/calculators/xtb.py uses them through the binary).
"""

from __future__ import annotations

import numpy as np

MDYN_TO_KCAL = 143.9326  # 1 mdyn/A = 143.93 kcal/mol/A^2

# (fixture name, (i, j), k_exp in mdyn/A) — harmonic stretching force
# constants from vibrational analyses (Herzberg; CCCBDB compilations)
TARGETS = [
    ("ethane", (0, 1), 4.50),        # C-C
    ("ethane", (0, 2), 4.80),        # C-H (sp3)
    ("methane", (0, 1), 5.00),       # C-H
    ("ethylene", (0, 1), 9.60),      # C=C
    ("acetylene", (0, 1), 15.70),    # C#C
    ("hydrogen_cyanide", (0, 1), 18.70),  # C#N
    ("ammonia", (0, 1), 6.35),       # N-H
    ("water", (0, 1), 8.45),         # O-H
    ("methanol", (0, 1), 5.20),      # C-O
    ("formaldehyde", (0, 1), 12.10),  # C=O
    ("h2s", (0, 1), 4.28),           # S-H
    ("methanethiol", (0, 1), 3.30),  # C-S
    ("phosphine", (0, 1), 3.22),     # P-H
    ("hydrogen_halide_9", (0, 1), 9.66),   # H-F
    ("hydrogen_halide_17", (0, 1), 5.16),  # H-Cl
    ("hydrogen_halide_35", (0, 1), 4.12),  # H-Br
    ("hydrogen_halide_53", (0, 1), 3.14),  # H-I
    ("methyl_halide_9", (0, 1), 5.67),     # C-F
    ("methyl_halide_17", (0, 1), 3.39),    # C-Cl
    ("methyl_halide_35", (0, 1), 2.88),    # C-Br
    ("methyl_halide_53", (0, 1), 2.28),    # C-I
]

ELEMENTS = [1, 6, 7, 8, 9, 15, 16, 17, 35, 53]


def _fixture(name):
    from firecode_tpu.calculators.gfnff import fixtures as fx

    if name.startswith(("hydrogen_halide", "methyl_halide")):
        base, z = name.rsplit("_", 1)
        return getattr(fx, base)(int(z))
    return getattr(fx, name)()


def _rows():
    """(z_i, z_j, bo, den, a) per target bond, from the real topology."""
    import jax.numpy as jnp

    from firecode_tpu.calculators.gfnff.energy import bond_params
    from firecode_tpu.calculators.gfnff.params import load_fitted
    from firecode_tpu.calculators.gfnff.topology import build_gfnff_topology

    p = load_fitted().asdict()
    rows = []
    for name, (i, j), k_exp in TARGETS:
        z, x = _fixture(name)
        top = build_gfnff_topology(z, x)
        bonds = np.asarray(top.bonds)
        k = next(
            kk for kk, (a_, b_) in enumerate(bonds) if {a_, b_} == {i, j}
        )
        r0, _, a = bond_params(top, p)
        rows.append(
            dict(
                name=name,
                zi=int(z[i]), zj=int(z[j]),
                bo=float(np.asarray(top.bond_bo)[k]),
                den=float(np.asarray(top.bond_den)[k]),
                a=float(np.asarray(jnp.asarray(a))[k]),
                k_exp=k_exp * MDYN_TO_KCAL,
            )
        )
    return rows, p


def calibrate(verbose: bool = True):
    from scipy.optimize import least_squares

    rows, p = _rows()
    kb_s = float(p["kb_s"])
    zidx = {z: i for i, z in enumerate(ELEMENTS)}

    def unpack(t):
        return t[: len(ELEMENTS)], t[len(ELEMENTS)]

    def model_logk(t):
        logs, kb_pi = unpack(t)
        out = []
        for r in rows:
            lsf = 0.5 * (logs[zidx[r["zi"]]] + logs[zidx[r["zj"]]])
            out.append(
                np.log(2.0 * kb_s)
                + lsf
                + np.log1p(kb_pi * r["bo"])
                + 2.0 * np.log(r["a"])
            )
        return np.array(out)

    target = np.log(np.array([r["k_exp"] for r in rows]))
    x0 = np.concatenate([np.zeros(len(ELEMENTS)), [0.5]])
    sol = least_squares(
        lambda t: model_logk(t) - target,
        x0,
        bounds=(
            np.concatenate([np.full(len(ELEMENTS), -3.0), [0.05]]),
            np.concatenate([np.full(len(ELEMENTS), 3.0), [2.0]]),
        ),
    )
    logs, kb_pi = unpack(sol.x)
    sf = {z: float(np.exp(l)) for z, l in zip(ELEMENTS, logs)}
    resid = np.exp(model_logk(sol.x) - target)
    if verbose:
        print("stretch factors:", {z: round(v, 3) for z, v in sf.items()})
        print(f"kb_pi = {kb_pi:.4f}")
        for r, q in zip(rows, resid):
            print(f"  {r['name']:22s} k_model/k_exp = {q:.3f}")
        print(f"rms log-error: {np.sqrt(np.mean(np.log(resid)**2)):.3f}")
    return sf, float(kb_pi)


if __name__ == "__main__":
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    calibrate()
