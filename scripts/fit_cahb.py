"""Refit the charge-assisted H-bond strengths (khb_qd / khb_qa) after the
excess-charge featurization change (advisor r4: feature dq vs the neutral
parent, not absolute setup charges).

Scans each parameter against its CCSD(T) anchor: khb_qd on NH4+...OH2
(donor-side CAHB, De 20.5), khb_qa on HO-...H2O (acceptor-side CAHB,
De 26.7). The two fixtures are feature-orthogonal (NH4+ has dq>0 only on
the donor side, OH- only on the acceptor side), so two 1-D solves suffice.

Run: python scripts/fit_cahb.py
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from firecode_tpu.calculators.gfnff import GFNFF, fixtures as fx
from firecode_tpu.calculators.gfnff.params import load_fitted
from firecode_tpu.opt.fire import optimize_batch


def de(zx, charge, site, tgt, sep_from, params):
    z, x = zx

    def e(xx):
        calc = GFNFF(np.asarray(z), np.asarray(xx), charge=charge,
                     charge_site=site, site_charge_target=tgt, params=params)
        res = optimize_batch(calc, jnp.asarray(xx)[None], fmax=0.02,
                             max_steps=4000)
        return float(res.energy[0])

    xs = np.asarray(x).copy()
    xs[sep_from:] += np.array([40.0, 0.0, 0.0])
    return e(xs) - e(x)


def solve(feature: str, fixture, charge, site, tgt_q, sep_from, target_de):
    """Secant solve for the param value that hits the anchor De."""
    base = load_fitted()
    vals, errs = [], []
    v = getattr(base, feature)
    for it in range(8):
        p = dataclasses.replace(base, **{feature: v})
        err = de(fixture, charge, site, tgt_q, sep_from, p) - target_de
        print(f"  {feature}={v:.3f} -> De err {err:+.2f} kcal/mol", flush=True)
        vals.append(v)
        errs.append(err)
        if abs(err) < 0.3:
            return v
        if len(vals) >= 2 and errs[-1] != errs[-2]:
            v = vals[-1] - errs[-1] * (vals[-1] - vals[-2]) / (errs[-1] - errs[-2])
            v = float(np.clip(v, 0.0, 200.0))
        else:
            v = v * (1.3 if err > 0 else 0.7) + 1.0
    return v


if __name__ == "__main__":
    print("khb_qd on NH4+...OH2 (target De -20.5 -> E(sep)-E(cplx)=+20.5):")
    qd = solve("khb_qd", fx.ammonium_water(), 1, [0, 1, 2, 3, 4], 1.0, 5, 20.5)
    print("khb_qa on HO-...H2O (target 26.7):")
    qa = solve("khb_qa", fx.hydroxide_water(), -1, [0, 1], -1.0, 2, 26.7)
    print(f"\nfitted: khb_qd={qd:.3f} khb_qa={qa:.3f}")
