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

from firecode_tpu.calculators.base import BatchedCalculator, Calculator
from firecode_tpu.calculators.gfnff.energy import (
    gfnff_charges,
    gfnff_energy,
    gfnff_energy_terms,
)
from firecode_tpu.calculators.gfnff.params import GlobalParams, load_fitted
from firecode_tpu.calculators.gfnff.topology import (
    GFNFFTopology,
    build_gfnff_topology,
    build_stacked_gfnff_topology,
    stacked_n_pad,
)

__all__ = [
    "GFNFF",
    "GFNFFTopology",
    "GlobalParams",
    "StackedGFNFF",
    "build_gfnff_topology",
    "build_stacked_gfnff_topology",
    "gfnff_charges",
    "gfnff_energy",
    "gfnff_energy_terms",
    "load_fitted",
    "stacked_n_pad",
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
        charge_site=None,
        site_charge_target: float | None = None,
        site_k: float | None = None,
    ):
        """eeq: "variational" (default) re-solves EEQ charges at every
        geometry (exact charge-flow forces); "topo" freezes the
        setup-geometry charges — the published GFN-FF convention and the
        fast path for large-N optimization (no O(N^3) solve per step).

        charge_site / site_charge_target: confine the net-charge transfer
        to a functional group for quantitative ion energetics (pKa
        workflows) — see GFNFFTopology.site_b."""
        if eeq not in ("variational", "topo"):
            raise ValueError(f"eeq must be 'variational' or 'topo', got {eeq!r}")
        self.topology = build_gfnff_topology(
            atomnos, coords, graph=graph, charge=charge,
            charge_site=charge_site, site_charge_target=site_charge_target,
            site_k=site_k,
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
        top = self.topology
        fn = lambda c: eeq_warm_init(
            c, *args, site_b=top.site_b, site_c=top.site_c, site_k=top.site_k
        )
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


class StackedGFNFF(BatchedCalculator):
    """GFN-FF over a batch of DIFFERENT molecules: lane b of a [S, N, 3]
    coordinate batch is evaluated with lane b's own generated force field
    (padded topology tables stacked along a leading system axis).

    This makes mixed-size bucketed batching work for the DEFAULT calculator
    (the reference optimizes multiple input files serially,
    standalone_optimizer.py:513): build with the systems list, then feed
    `padded_coords` / `atom_mask` to opt.fire.optimize_batch. The stateful
    warm-EEQ fast path composes lane-wise exactly as in the single-molecule
    GFNFF calculator."""

    def __init__(
        self,
        systems,
        charges=None,
        n_pad: int | None = None,
        params: GlobalParams | None = None,
        eeq: str = "variational",
    ):
        if eeq not in ("variational", "topo"):
            raise ValueError(f"eeq must be 'variational' or 'topo', got {eeq!r}")
        from firecode_tpu.calculators.forcefield import pad_systems

        n = stacked_n_pad(systems, n_pad)
        self.topology = build_stacked_gfnff_topology(systems, charges, n_pad=n)
        self.atomnos, self.padded_coords, self.atom_mask = pad_systems(
            systems, n_pad=n
        )
        self.params = (params or load_fitted()).asdict()
        self.eeq = eeq
        super().__init__(name="gfnff-stacked" if eeq == "variational" else "gfnff-topo-stacked")
        self.stateful = eeq == "variational"

    # ---- stateless batched surface ----

    def energy(self, coords):
        import jax
        import jax.numpy as jnp

        p, eeq = self.params, self.eeq
        return jax.vmap(lambda c, t: gfnff_energy(c, t, p, eeq=eeq))(
            jnp.asarray(coords), self.topology
        )

    def energy_and_forces(self, coords):
        import jax
        import jax.numpy as jnp

        p, eeq = self.params, self.eeq
        e, g = jax.vmap(
            jax.value_and_grad(lambda c, t: gfnff_energy(c, t, p, eeq=eeq))
        )(jnp.asarray(coords), self.topology)
        return e, -g

    # ---- stateful warm-EEQ fast path (per-lane state, per-lane topology) --

    def _lane_eeq_args(self, t, dt):
        return (
            t.chi.astype(dt), t.eta.astype(dt), t.eeq_alpha.astype(dt),
            t.cnf.astype(dt), t.rcov.astype(dt), t.charge,
        )

    def init_state(self, coords):
        if not self.stateful:
            return ()
        import jax
        import jax.numpy as jnp

        from firecode_tpu.calculators.gfnff.energy import eeq_warm_init

        coords = jnp.asarray(coords)

        def one(c, t):
            return eeq_warm_init(
                c, *self._lane_eeq_args(t, c.dtype),
                site_b=t.site_b, site_c=t.site_c, site_k=t.site_k,
            )

        return jax.vmap(one)(coords, self.topology)

    def energy_and_forces_state(self, coords, state):
        if not self.stateful:
            return super().energy_and_forces_state(coords, state)
        import jax
        import jax.numpy as jnp

        from firecode_tpu.calculators.gfnff.energy import gfnff_energy_warm

        p = self.params

        def one(c, t, s):
            return gfnff_energy_warm(c, t, p, s)

        (e, s_new), g = jax.vmap(jax.value_and_grad(one, has_aux=True))(
            jnp.asarray(coords), self.topology, state
        )
        return e, -g, s_new
