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

    def __init__(self, energy_fn: Callable[[jnp.ndarray], jnp.ndarray], name: str = "calc"):
        self._energy_fn = energy_fn
        self.name = name

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
        return Calculator(lambda c: base(c) + extra_fn(c), name or self.name)
