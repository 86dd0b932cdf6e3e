"""Native GFN-FF: a generated force field in pure JAX (CALC=GFNFF).

Public surface:
- GFNFF(atomnos, coords, charge=0) -> Calculator (batched energies/forces)
- build_gfnff_topology / gfnff_energy for direct use
- GlobalParams / load_fitted for the fitted global scalars

See params.py for provenance (functional forms from Spicher & Grimme 2020;
parameters re-derived in-repo and validated against the embedded literature
fixtures in tests/test_accuracy.py + ACCURACY.json).
"""

from __future__ import annotations

import numpy as np

from firecode_tpu.calculators.base import Calculator
from firecode_tpu.calculators.gfnff.energy import (
    gfnff_charges,
    gfnff_energy,
    gfnff_energy_terms,
)
from firecode_tpu.calculators.gfnff.params import GlobalParams, load_fitted
from firecode_tpu.calculators.gfnff.topology import (
    GFNFFTopology,
    build_gfnff_topology,
)

__all__ = [
    "GFNFF",
    "GFNFFTopology",
    "GlobalParams",
    "build_gfnff_topology",
    "gfnff_charges",
    "gfnff_energy",
    "gfnff_energy_terms",
    "load_fitted",
]


class GFNFF(Calculator):
    """Calculator facade over the generated GFN-FF topology."""

    def __init__(
        self,
        atomnos: np.ndarray,
        coords: np.ndarray,
        graph=None,
        charge: int = 0,
        params: GlobalParams | None = None,
        eeq: str = "variational",
    ):
        """eeq: "variational" (default) re-solves EEQ charges at every
        geometry (exact charge-flow forces); "topo" freezes the
        setup-geometry charges — the published GFN-FF convention and the
        fast path for large-N optimization (no O(N^3) solve per step)."""
        if eeq not in ("variational", "topo"):
            raise ValueError(f"eeq must be 'variational' or 'topo', got {eeq!r}")
        self.topology = build_gfnff_topology(
            atomnos, coords, graph=graph, charge=charge
        )
        self.params = (params or load_fitted()).asdict()
        self.eeq = eeq
        top, p = self.topology, self.params
        super().__init__(
            lambda c: gfnff_energy(c, top, p, eeq=eeq),
            name="gfnff" if eeq == "variational" else "gfnff-topo",
        )
        # warm-start fast path for optimizers/integrators: carry the EEQ
        # solution pair across steps, refresh with a few detached PCG
        # iterations, forces exactly Hellmann-Feynman (energy.py:
        # eeq_energy_charges_warm). Hessian/frequency paths keep using
        # energy() -> the variational custom_linear_solve.
        self.stateful = eeq == "variational"

    def _eeq_args(self, dt):
        top = self.topology
        return (
            top.chi.astype(dt), top.eta.astype(dt), top.eeq_alpha.astype(dt),
            top.cnf.astype(dt), top.rcov.astype(dt), top.charge,
        )

    def init_state(self, coords):
        if not self.stateful:
            return ()
        import jax
        import jax.numpy as jnp

        from firecode_tpu.calculators.gfnff.energy import eeq_warm_init

        coords = jnp.asarray(coords)
        args = self._eeq_args(coords.dtype)
        fn = lambda c: eeq_warm_init(c, *args)
        for _ in range(coords.ndim - 2):
            fn = jax.vmap(fn)
        return fn(coords)

    def energy_and_forces_state(self, coords, state):
        if not self.stateful:
            return super().energy_and_forces_state(coords, state)
        import jax

        from firecode_tpu.calculators.gfnff.energy import gfnff_energy_warm

        top, p = self.topology, self.params

        def one(c, s):
            return gfnff_energy_warm(c, top, p, s)

        fn = jax.value_and_grad(one, has_aux=True)
        for _ in range(coords.ndim - 2):
            fn = jax.vmap(fn)
        (e, s_new), g = fn(coords, state)
        return e, -g, s_new

    def charges(self, coords) -> np.ndarray:
        """Runtime EEQ charges for one structure [N, 3]."""
        import jax.numpy as jnp

        return np.asarray(gfnff_charges(jnp.asarray(coords), self.topology))
