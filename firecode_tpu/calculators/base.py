"""Calculator protocol: batched energies and forces as pure JAX functions.

This replaces the reference's ASE-calculator plumbing (firecode/dispatcher.py,
SURVEY.md L5): instead of one Python object evaluating one structure in one
process, a Calculator here exposes

    energy(coords f[..., N, 3]) -> e f[...]
    energy_and_forces(coords)   -> (e, f[..., N, 3])

with forces obtained by reverse-mode autodiff, so the same object serves a
single structure, a vmapped conformer ensemble, NEB images, or a sharded
multi-chip batch. Units: Angstrom in, kcal/mol out.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


class Calculator:
    """Wraps a pure per-structure energy function e(coords[N, 3]) -> scalar."""

    # Stateful fast path: calculators whose energy contains an iterative
    # inner solve (e.g. the GFN-FF variational EEQ) set stateful=True and
    # override init_state / energy_and_forces_state so optimizers and
    # integrators can warm-start the solve across steps. Contract: the
    # state is a fixed-shape pytree, and energy_and_forces_state must
    # return forces equal to energy_and_forces up to the inner-solve
    # residual (which the warm start keeps at machine precision once the
    # carry settles).
    stateful: bool = False

    def __init__(self, energy_fn: Callable[[jnp.ndarray], jnp.ndarray], name: str = "calc"):
        self._energy_fn = energy_fn
        self.name = name

    def init_state(self, coords: jnp.ndarray):
        """Warm-start state for a [..., N, 3] batch (stateless: empty)."""
        return ()

    def energy_and_forces_state(self, coords: jnp.ndarray, state):
        """(energy, forces, new_state); default delegates statelessly."""
        e, f = self.energy_and_forces(coords)
        return e, f, state

    def energy_one(self, coords: jnp.ndarray) -> jnp.ndarray:
        return self._energy_fn(coords)

    def energy(self, coords: jnp.ndarray) -> jnp.ndarray:
        """Batched energy over any leading dims."""
        fn = self._energy_fn
        for _ in range(coords.ndim - 2):
            fn = jax.vmap(fn)
        return fn(coords)

    def energy_and_forces(self, coords: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Batched (energy, forces = -grad E) over any leading dims."""
        fn = jax.value_and_grad(self._energy_fn)
        for _ in range(coords.ndim - 2):
            fn = jax.vmap(fn)
        e, g = fn(coords)
        return e, -g

    def with_extra(self, extra_fn: Callable[[jnp.ndarray], jnp.ndarray], name: str | None = None) -> "Calculator":
        """New calculator adding an energy term (constraint penalty, bias...)."""
        base = self._energy_fn
        new = Calculator(lambda c: base(c) + extra_fn(c), name or self.name)
        if self.stateful:
            # the extra term is coordinate-only, so the warm-start state and
            # its Hellmann-Feynman force contract pass through unchanged
            parent = self
            new.stateful = True
            new.init_state = parent.init_state

            def efs(coords, state):
                e, f, st = parent.energy_and_forces_state(coords, state)
                gfn = jax.value_and_grad(extra_fn)
                for _ in range(coords.ndim - 2):
                    gfn = jax.vmap(gfn)
                ee, ge = gfn(coords)
                return e + ee, f - ge, st

            new.energy_and_forces_state = efs
        return new


def efs_for(calc: Calculator):
    """(efs, init) pair for step loops: the stateful fast path when the
    calculator advertises one, else a stateless shim with an empty carry.

    efs(coords, aux) -> (energy, forces, new_aux); init(coords) -> aux0.
    Optimizers/integrators carry aux through their loop so iterative inner
    solves (GFN-FF variational EEQ) warm-start across steps."""
    if calc.stateful:
        return calc.energy_and_forces_state, calc.init_state

    def efs(coords, aux):
        e, f = calc.energy_and_forces(coords)
        return e, f, aux

    return efs, lambda coords: ()


class BatchedCalculator(Calculator):
    """Base for INHERENTLY batched calculators: lane b of a [B, N, 3] batch
    carries its own state (its own molecule's topology, its own restraint
    target), so there is no meaningful per-structure energy function.

    Subclasses override energy/energy_and_forces on full batches;
    energy_one raises, and with_extra composes a per-structure extra term
    LANE-WISE (so penalty constraints / solvation still work) instead of
    silently wrapping the raw batched closure into a per-structure
    Calculator (which would vmap batch-shaped tables over single
    structures and produce shape errors or wrong energies)."""

    def __init__(self, name: str = "batched-calc"):
        super().__init__(self._no_single_structure, name)

    def _no_single_structure(self, coords):
        raise NotImplementedError(
            f"{self.name} is inherently batched (per-lane state): evaluate "
            "[B, N, 3] batches via .energy()/.energy_and_forces()"
        )

    def energy_one(self, coords):
        self._no_single_structure(coords)

    def with_extra(self, extra_fn: Callable[[jnp.ndarray], jnp.ndarray], name: str | None = None) -> "Calculator":
        parent = self

        class _WithExtra(BatchedCalculator):
            def energy(self, coords):
                coords = jnp.asarray(coords)
                return parent.energy(coords) + jax.vmap(extra_fn)(coords)

            def energy_and_forces(self, coords):
                coords = jnp.asarray(coords)
                e_p, f_p = parent.energy_and_forces(coords)
                e_e, g_e = jax.vmap(jax.value_and_grad(extra_fn))(coords)
                return e_p + e_e, f_p - g_e

        return _WithExtra(name or self.name)
