"""Ensemble population / conformational-entropy analysis.

The CREST ecosystem reports, next to every pruned ensemble, its Boltzmann
populations, conformational entropy S_conf and ensemble free energy G_conf
(cregen output; the dedicated `--entropy` mode of Pracht & Grimme,
Chem. Sci. 2021, 12, 6551). The reference reaches those numbers only through
the CREST binary (reference interfaces/crest.py:444); here they are native
host math over the batched ensemble energies, composable with the batched
qRRHO free-energy corrections (thermo.rrho_thermo on vmapped exact Hessians).

Definitions (degeneracy-aware; g_i = rotamer multiplicity of conformer i):
    Z       = sum_i g_i exp(-(G_i - G_min) / RT)
    p_i     = g_i exp(-(G_i - G_min) / RT) / Z
    S_conf  = -R sum_i p_i (ln p_i - ln g_i)          [>= 0]
    G_conf  = G_min - RT ln Z                          [ensemble free energy]
    <G>     = sum_i p_i G_i,   and   <G> - T S_conf == G_conf  (identity)

All arithmetic is float64 on host — ensembles surviving the prune cascade are
small (<= 1e5), so this is report-path work, not a device kernel.
"""

from __future__ import annotations

import numpy as np

from firecode_tpu.units import R_KCAL


def boltzmann_populations(
    g_kcal: np.ndarray,
    T: float = 298.15,
    degeneracies: np.ndarray | None = None,
) -> np.ndarray:
    """Populations p_i from per-conformer (free) energies in kcal/mol.

    Stable softmax referenced to the minimum; `degeneracies` are optional
    per-conformer rotamer multiplicities (default 1)."""
    g = np.asarray(g_kcal, dtype=np.float64).ravel()
    if g.size == 0:
        return g
    mult = (
        np.ones_like(g)
        if degeneracies is None
        else np.asarray(degeneracies, dtype=np.float64).ravel()
    )
    if mult.size != g.size:
        raise ValueError(
            f"degeneracies length {mult.size} != number of energies {g.size}"
        )
    w = mult * np.exp(-(g - g.min()) / (R_KCAL * T))
    return w / w.sum()


def rotamer_degeneracies(
    coords: np.ndarray,
    atomnos: np.ndarray,
    energies: np.ndarray | None = None,
    rmsd_thr: float = 0.25,
    max_dE: float = 0.5,
    max_perms: int = 60,
) -> tuple[np.ndarray, np.ndarray, np.ndarray | None]:
    """Group rotamer-duplicate structures:
    (kept indices, multiplicities, per-group minimum energies or None).

    cregen prints each conformer's rotamer degeneracy next to its
    population and feeds it into S_conf; here the groups come from the
    native rot-corr prune (greedy keep-first, so kept indices match
    prune_by_rmsd_rot_corr exactly), and every pruned structure is
    assigned to its nearest keeper under the rotamer permutations. Each
    group's representative energy is the MINIMUM over its members (as
    cregen represents a rotamer group by its lowest conformer), so grouped
    G_conf/populations are not skewed by which member survived the greedy
    keep-first order."""
    import jax.numpy as jnp

    from firecode_tpu.ops.rmsd import pairwise_rmsd
    from firecode_tpu.prune import prune_by_rmsd_rot_corr
    from firecode_tpu.torsions import rotamer_permutations

    coords_np = np.asarray(coords)
    n = coords_np.shape[0]
    if n == 0:
        e_empty = None if energies is None else np.zeros(0)
        return np.zeros(0, dtype=np.int64), np.zeros(0), e_empty
    perms = rotamer_permutations(
        np.asarray(atomnos), coords_np[0], max_perms=max_perms
    )
    keep = prune_by_rmsd_rot_corr(
        coords_np,
        atomnos,
        permutations=perms if perms.size else None,
        rmsd_thr=rmsd_thr,
        energies=energies,
        max_dE=max_dE,
        use_maxdev=False,
    )
    kept_idx = np.flatnonzero(keep)
    out_idx = np.flatnonzero(~keep)
    deg = np.ones(kept_idx.size)
    e_group = (
        None
        if energies is None
        else np.asarray(energies, dtype=np.float64).ravel()[kept_idx].copy()
    )
    if out_idx.size:
        a = jnp.asarray(coords_np[out_idx])
        bk = jnp.asarray(coords_np[kept_idx])
        best = np.asarray(pairwise_rmsd(a, bk))
        for p in np.asarray(perms, dtype=np.int64).reshape(-1, coords_np.shape[1]):
            best = np.minimum(best, np.asarray(pairwise_rmsd(a, bk[:, p, :])))
        assign = np.argmin(best, axis=1)
        deg += np.bincount(assign, minlength=kept_idx.size)
        if e_group is not None:
            np.minimum.at(
                e_group, assign, np.asarray(energies, dtype=np.float64).ravel()[out_idx]
            )
    return kept_idx, deg, e_group


def ensemble_analysis(
    g_kcal: np.ndarray,
    T: float = 298.15,
    degeneracies: np.ndarray | None = None,
) -> dict:
    """Full population analysis of one ensemble.

    Returns populations (input order), S_conf (cal/mol/K), -T*S_conf and
    G_conf / <G> (kcal/mol), plus occupancy bookkeeping matching cregen's
    ensemble summary."""
    g = np.asarray(g_kcal, dtype=np.float64).ravel()
    mult = (
        np.ones_like(g)
        if degeneracies is None
        else np.asarray(degeneracies, dtype=np.float64).ravel()
    )
    if mult.size != g.size:
        raise ValueError(
            f"degeneracies length {mult.size} != number of energies {g.size}"
        )
    p = boltzmann_populations(g, T=T, degeneracies=degeneracies)
    if g.size == 0:
        # full key set so empty-ensemble callers never KeyError
        return {
            "n_conformers": 0,
            "T": float(T),
            "populations": p,
            "s_conf_cal_mol_k": 0.0,
            "minus_t_s_conf_kcal": 0.0,
            "g_conf_kcal": float("nan"),
            "g_avg_kcal": float("nan"),
            "g_min_kcal": float("nan"),
            "p_best": float("nan"),
            "n_for_90pct": 0,
        }
    g_rel = g - g.min()
    z = float(np.sum(mult * np.exp(-g_rel / (R_KCAL * T))))
    # -R sum p (ln p - ln g): entropy of the rotamer-expanded state space
    with np.errstate(divide="ignore", invalid="ignore"):
        s_terms = np.where(p > 0.0, p * (np.log(p) - np.log(mult)), 0.0)
    s_conf = -R_KCAL * float(np.sum(s_terms))  # kcal/(mol K)
    g_conf = float(g.min() - R_KCAL * T * np.log(z))
    g_avg = float(np.sum(p * g))
    order = np.argsort(g, kind="stable")
    cum = np.cumsum(p[order])
    return {
        "n_conformers": int(g.size),
        "T": float(T),
        "populations": p,
        "s_conf_cal_mol_k": s_conf * 1000.0,
        "minus_t_s_conf_kcal": -T * s_conf,
        "g_conf_kcal": g_conf,
        "g_avg_kcal": g_avg,
        "g_min_kcal": float(g.min()),
        "p_best": float(p.max()),
        # how many lowest conformers cover 90% of the population
        "n_for_90pct": int(np.searchsorted(cum, 0.90) + 1),
    }
