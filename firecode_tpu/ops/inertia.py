"""Batched moments of inertia (closed-form symmetric 3x3 eigenvalues).

Replaces prism_pruner.get_inertia_moments (SURVEY.md section 2.2). The
eigenvalues use the trigonometric closed form rather than an iterative
eigensolver, so a full ensemble batches as pure VPU math with no lax loops.
"""

from __future__ import annotations

import jax.numpy as jnp


def eigvalsh3x3(a: jnp.ndarray) -> jnp.ndarray:
    """Eigenvalues of symmetric [..., 3, 3], ascending, closed form."""
    a01, a02, a12 = a[..., 0, 1], a[..., 0, 2], a[..., 1, 2]
    a00, a11, a22 = a[..., 0, 0], a[..., 1, 1], a[..., 2, 2]
    p1 = a01 * a01 + a02 * a02 + a12 * a12
    q = (a00 + a11 + a22) / 3.0
    p2 = (a00 - q) ** 2 + (a11 - q) ** 2 + (a22 - q) ** 2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 0.0))
    safe_p = jnp.where(p > 1e-30, p, 1.0)
    b = (a - q[..., None, None] * jnp.eye(3, dtype=a.dtype)) / safe_p[..., None, None]
    detb = (
        b[..., 0, 0] * (b[..., 1, 1] * b[..., 2, 2] - b[..., 1, 2] * b[..., 2, 1])
        - b[..., 0, 1] * (b[..., 1, 0] * b[..., 2, 2] - b[..., 1, 2] * b[..., 2, 0])
        + b[..., 0, 2] * (b[..., 1, 0] * b[..., 2, 1] - b[..., 1, 1] * b[..., 2, 0])
    )
    r = jnp.clip(detb / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    e_hi = q + 2.0 * p * jnp.cos(phi)
    e_lo = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e_mid = 3.0 * q - e_hi - e_lo
    # diagonal case (p ~ 0): all eigenvalues = q anyway via the formulas,
    # but guard against 0/0 explicitly
    diag = p <= 1e-30
    e_lo = jnp.where(diag, q, e_lo)
    e_mid = jnp.where(diag, q, e_mid)
    e_hi = jnp.where(diag, q, e_hi)
    return jnp.stack([e_lo, e_mid, e_hi], axis=-1)


def inertia_tensor(coords: jnp.ndarray, masses: jnp.ndarray) -> jnp.ndarray:
    """Inertia tensor about the center of mass.

    coords: [..., N, 3], masses: [N] (zero-mass = padding) -> [..., 3, 3].
    """
    m = masses.astype(coords.dtype)
    msum = jnp.sum(m)
    com = jnp.sum(coords * m[:, None], axis=-2, keepdims=True) / msum
    r = coords - com
    r2 = jnp.sum(r * r, axis=-1)  # [..., N]
    eye = jnp.eye(3, dtype=coords.dtype)
    # I_ab = sum_n m_n (r^2 delta_ab - r_a r_b)
    outer = jnp.einsum("...na,...nb->...nab", r, r)
    return jnp.einsum(
        "n,...nab->...ab", m, r2[..., None, None] * eye - outer
    )


def inertia_moments(coords: jnp.ndarray, masses: jnp.ndarray) -> jnp.ndarray:
    """Principal moments of inertia, ascending. coords [..., N, 3] -> [..., 3]."""
    return eigvalsh3x3(inertia_tensor(coords, masses))


def moi_align(coords: jnp.ndarray, masses: jnp.ndarray) -> jnp.ndarray:
    """Align every structure's principal inertia axes to the first frame's.

    coords: [B, N, 3] -> aligned [B, N, 3], all centered at the center of
    mass. Eigenvector sign ambiguity is fixed by orienting each axis toward
    positive overlap with the reference axes and restoring det = +1.
    Capability parity with the reference's align_by_moi
    (firecode/hypermolecule_class.py:45-86).
    """
    m = masses.astype(coords.dtype)
    msum = jnp.sum(m)
    com = jnp.sum(coords * m[None, :, None], axis=1, keepdims=True) / msum
    centered = coords - com

    tensors = inertia_tensor(centered, m)  # [B, 3, 3]
    _, axes = jnp.linalg.eigh(tensors)  # columns = principal axes

    # make every frame a proper rotation, then express each structure in its
    # own principal frame: x' = axes^T x
    det = jnp.linalg.det(axes)
    axes = axes.at[:, :, 2].multiply(jnp.where(det < 0, -1.0, 1.0)[:, None])
    canonical = jnp.einsum("bji,bnj->bni", axes, centered)

    # principal frames are defined up to 180-degree flips about each axis
    # (4 proper sign combinations): pick, per structure, the flip with the
    # best atomwise overlap against frame 0
    flips = jnp.asarray(
        [[1.0, 1.0, 1.0], [1.0, -1.0, -1.0], [-1.0, 1.0, -1.0], [-1.0, -1.0, 1.0]],
        dtype=coords.dtype,
    )
    cand = canonical[:, None, :, :] * flips[None, :, None, :]  # [B, 4, N, 3]
    overlap = jnp.sum(cand * canonical[0][None, None], axis=(-2, -1))  # [B, 4]
    best = jnp.argmax(overlap, axis=1)
    chosen = jnp.take_along_axis(
        cand, best[:, None, None, None], axis=1
    )[:, 0]
    return chosen
