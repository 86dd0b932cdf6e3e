"""Freezing-String Method: two-ended TS path growth.

Capability parity with the reference's ML-FSM operator
(firecode/ase_manipulations.py:1402-1510): the string grows inward from both
endpoints; each newly added node is relaxed only PERPENDICULAR to the local
tangent (nodes freeze once placed), and the highest node seeds a saddle
refinement. The perpendicular relaxation of the two frontier nodes runs as
one batched jitted loop.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from firecode_tpu.calculators.base import Calculator, efs_for


class FSMResult(NamedTuple):
    string: np.ndarray  # [M, N, 3]
    energies: np.ndarray  # [M]
    ts_index: int
    ts_coords: np.ndarray
    ts_energy: float


@partial(jax.jit, static_argnames=("calc", "n_steps"))
def _relax_perpendicular(coords, tangents, calc: Calculator, n_steps: int, step_size=0.01):
    """Steepest-descent on the force component perpendicular to the tangent.

    coords/tangents: [B, N, 3]; tangents are unit-normalized per node.
    Stateful calculators warm-start their inner solve across the loop
    (calculators.base.efs_for, same as opt/fire.py).
    """
    efs, aux_init = efs_for(calc)

    def body(_, carry):
        x, aux = carry
        _, f, aux = efs(x, aux)
        f_par = jnp.sum(f * tangents, axis=(-2, -1), keepdims=True) * tangents
        f_perp = f - f_par
        step = step_size * f_perp
        norm = jnp.sqrt(jnp.sum(step * step, axis=-1, keepdims=True)) + 1e-12
        step = step * jnp.minimum(1.0, 0.05 / norm)
        return x + step, aux

    x, _ = jax.lax.fori_loop(0, n_steps, body, (coords, aux_init(coords)))
    return x


def run_fsm(
    calc: Calculator,
    start: np.ndarray,
    end: np.ndarray,
    n_nodes: int = 12,
    relax_steps: int = 40,
    logfunction=None,
) -> FSMResult:
    log = logfunction or (lambda s: None)
    left = [np.asarray(start, dtype=np.float64)]
    right = [np.asarray(end, dtype=np.float64)]

    while len(left) + len(right) < n_nodes:
        remaining = n_nodes - len(left) - len(right)
        a, b = left[-1], right[-1]
        gap = b - a
        dist = float(np.linalg.norm(gap))
        step_len = dist / (remaining + 1)
        unit = gap / max(dist, 1e-9)

        if remaining == 1:
            new_nodes = np.stack([a + 0.5 * dist * unit])
        else:
            new_nodes = np.stack([a + step_len * unit, b - step_len * unit])
        tangents = np.broadcast_to(unit, new_nodes.shape)

        relaxed = np.asarray(
            _relax_perpendicular(
                jnp.asarray(new_nodes), jnp.asarray(tangents), calc, relax_steps
            ),
            dtype=np.float64,
        )
        if remaining == 1:
            left.append(relaxed[0])
        else:
            left.append(relaxed[0])
            right.append(relaxed[1])
        log(f"    FSM: {len(left) + len(right)}/{n_nodes} nodes placed")

    string = np.stack(left + list(reversed(right)))
    energies = np.asarray(calc.energy(jnp.asarray(string)), dtype=np.float64)
    ts_index = int(np.argmax(energies))
    return FSMResult(
        string=string,
        energies=energies,
        ts_index=ts_index,
        ts_coords=string[ts_index],
        ts_energy=float(energies[ts_index]),
    )
