"""Batched 3D vector algebra in JAX.

Every function here is shape-polymorphic over leading batch dimensions and
safe under `jax.vmap`/`jax.jit` — the building blocks for the embed
geometry transforms and the torsion engine. Capability parity with the
reference's algebra helpers (firecode/algebra.py:23-54, firecode/utils.py:
224-249) and the prism_pruner algebra call-surface (SURVEY.md section 2.2).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def norm_of(v: jnp.ndarray) -> jnp.ndarray:
    """Euclidean norm over the last axis."""
    return jnp.sqrt(jnp.sum(v * v, axis=-1))


def normalize(v: jnp.ndarray) -> jnp.ndarray:
    """Unit vector along the last axis (safe at zero)."""
    return v / jnp.maximum(norm_of(v)[..., None], _EPS)


def vec_angle(v1: jnp.ndarray, v2: jnp.ndarray) -> jnp.ndarray:
    """Angle between two vectors, in degrees."""
    cos = jnp.clip(jnp.sum(normalize(v1) * normalize(v2), axis=-1), -1.0, 1.0)
    return jnp.degrees(jnp.arccos(cos))


def point_angle(p1: jnp.ndarray, p2: jnp.ndarray, p3: jnp.ndarray) -> jnp.ndarray:
    """Planar angle p1-p2-p3, in degrees."""
    return vec_angle(p1 - p2, p3 - p2)


def dihedral(p: jnp.ndarray) -> jnp.ndarray:
    """Signed dihedral angle from four points, in degrees in (-180, 180].

    p: [..., 4, 3]. Uses the atan2 formulation (numerically stable for
    near-linear geometries).
    """
    p0, p1, p2, p3 = p[..., 0, :], p[..., 1, :], p[..., 2, :], p[..., 3, :]
    b0 = p0 - p1
    b1 = p2 - p1
    b2 = p3 - p2
    b1n = normalize(b1)
    # components orthogonal to the central bond
    v = b0 - jnp.sum(b0 * b1n, axis=-1, keepdims=True) * b1n
    w = b2 - jnp.sum(b2 * b1n, axis=-1, keepdims=True) * b1n
    x = jnp.sum(v * w, axis=-1)
    y = jnp.sum(jnp.cross(b1n, v) * w, axis=-1)
    return jnp.degrees(jnp.arctan2(y, x))


def rot_mat_from_pointer(pointer: jnp.ndarray, angle_deg: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix about an axis (`pointer`) by `angle_deg` degrees.

    Quaternion construction; batched over any leading dims of pointer/angle.
    Convention: row vectors rotate as v' = R @ v (column convention).
    """
    angle = jnp.radians(jnp.asarray(angle_deg))
    axis = normalize(jnp.asarray(pointer))
    half = angle / 2.0
    w = jnp.cos(half)
    xyz = axis * jnp.sin(half)[..., None]
    return quaternion_to_matrix(jnp.concatenate([w[..., None], xyz], axis=-1))


def quaternion_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion [..., 4] (w, x, y, z) -> rotation matrix [..., 3, 3]."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], axis=-1
    )
    row1 = jnp.stack(
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], axis=-1
    )
    row2 = jnp.stack(
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], axis=-1
    )
    return jnp.stack([row0, row1, row2], axis=-2)


def rotation_matrix_from_vectors(vec1: jnp.ndarray, vec2: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix taking vec1 onto vec2 (minimal rotation).

    Antiparallel inputs rotate 180 degrees about a perpendicular axis.
    """
    a = normalize(vec1)
    b = normalize(vec2)
    c = jnp.sum(a * b, axis=-1)  # cos
    v = jnp.cross(a, b)
    s2 = jnp.sum(v * v, axis=-1)  # sin^2

    kmat = _skew(v)
    # Rodrigues; the (1-c)/s^2 factor is safe except at c = +-1
    factor = (1.0 - c) / (s2 + _EPS)
    rot = (
        jnp.eye(3, dtype=a.dtype)
        + kmat
        + jnp.matmul(kmat, kmat) * factor[..., None, None]
    )

    # antiparallel: rotate 180 deg about any axis perpendicular to a
    perp = jnp.cross(a, jnp.where(jnp.abs(a[..., :1]) < 0.9, _ex(a), _ey(a)))
    flip = quaternion_to_matrix(
        jnp.concatenate([jnp.zeros_like(c)[..., None], normalize(perp)], axis=-1)
    )

    parallel = s2 < 1e-16
    anti = parallel & (c < 0.0)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=a.dtype), rot.shape)
    return jnp.where(
        anti[..., None, None], flip, jnp.where(parallel[..., None, None], eye, rot)
    )


def _ex(like: jnp.ndarray) -> jnp.ndarray:
    e = jnp.zeros_like(like)
    return e.at[..., 0].set(1.0)


def _ey(like: jnp.ndarray) -> jnp.ndarray:
    e = jnp.zeros_like(like)
    return e.at[..., 1].set(1.0)


def _skew(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric cross-product matrix [..., 3, 3] of v [..., 3]."""
    zero = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([zero, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], zero, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], zero], axis=-1),
        ],
        axis=-2,
    )


def align_vec_pair(ref: jnp.ndarray, tgt: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix optimally aligning two target vectors onto two
    reference vectors (Kabsch on a 2-vector correlation).

    ref, tgt: [..., 2, 3]. Returns R [..., 3, 3] with R @ tgt_j ~ ref_j.
    Mirrors firecode/algebra.py:28-49.
    """
    b = jnp.einsum("...ji,...jk->...ik", ref, tgt)  # sum_j ref_j outer tgt_j
    u, s, vh = jnp.linalg.svd(b)
    det = jnp.linalg.det(jnp.matmul(u, vh))
    # flip last singular direction for improper rotations
    u = u.at[..., :, -1].multiply(jnp.where(det < 0, -1.0, 1.0)[..., None])
    return jnp.matmul(u, vh)
