"""Dihedral measurement and dihedral-driving kernels.

Replaces prism_pruner's rotate_dihedral / dihedral and the reference's torsion
fingerprints (firecode/torsion_module.py:957-1076) with batched device math:
a whole angle grid over a whole conformer batch rotates in one vmapped call.
"""

from __future__ import annotations

import jax.numpy as jnp

from firecode_tpu.ops.algebra import dihedral, normalize, rot_mat_from_pointer


def measure_dihedrals(coords: jnp.ndarray, quadruplets: jnp.ndarray) -> jnp.ndarray:
    """Signed dihedrals (degrees) for each quadruplet.

    coords: [..., N, 3]; quadruplets: i32[T, 4] -> [..., T].
    """
    pts = coords[..., quadruplets, :]  # [..., T, 4, 3]
    return dihedral(pts)


def torsion_fingerprints(coords: jnp.ndarray, quadruplets: jnp.ndarray) -> jnp.ndarray:
    """Torsion-fingerprint matrix for a batch: [B, N, 3] -> [B, T]."""
    return measure_dihedrals(coords, quadruplets)


def tfd_distance_matrix(tf_a: jnp.ndarray, tf_b: jnp.ndarray) -> jnp.ndarray:
    """Summed angular-difference matrix between fingerprint stacks.

    tf_a: [K, T], tf_b: [L, T] -> [K, L]; per-torsion deltas are wrapped to
    [0, 180] before summing (firecode/torsion_module.py:1056-1067).
    """
    delta = jnp.abs(tf_a[:, None, :] - tf_b[None, :, :])
    delta = jnp.abs(delta - (delta > 180.0) * 360.0)
    return jnp.sum(delta, axis=-1)


def rotate_dihedral(
    coords: jnp.ndarray,
    quadruplet: jnp.ndarray,
    angle_deg: jnp.ndarray,
    mask: jnp.ndarray,
) -> jnp.ndarray:
    """Rotate the masked atoms about the i2-i3 bond by angle_deg degrees.

    coords: [..., N, 3]; quadruplet: i32[4]; mask: bool[N] selects the moving
    side (reachable from i4, reference torsion_module.py:354-382). A positive
    angle increases the measured (i1, i2, i3, i4) dihedral by that amount.
    Batched over leading dims of coords and/or angle_deg.
    """
    i2, i3 = quadruplet[1], quadruplet[2]
    origin = coords[..., i3, :][..., None, :]
    axis = normalize(coords[..., i3, :] - coords[..., i2, :])
    rot = rot_mat_from_pointer(axis, angle_deg)  # [..., 3, 3]
    moved = jnp.einsum("...xy,...ny->...nx", rot, coords - origin) + origin
    return jnp.where(mask[..., :, None], moved, coords)
