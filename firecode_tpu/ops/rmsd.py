"""Batched/pairwise minimum RMSD via the QCP quaternion method.

The pruning engine's hot kernel. Instead of per-pair Kabsch SVDs (the CPU
reference's approach via prism_pruner, see SURVEY.md section 2.2), all pairwise
correlation matrices for a (K-row x L-col) tile of structure pairs are computed
as ONE matmul that maps onto the MXU:

    S[i, j] = A_i^T B_j   for all pairs  ==  (K*3, N) @ (N, L*3)

and the largest eigenvalue of each 4x4 QCP key matrix is found with a
branch-free Newton iteration on its characteristic quartic (Theobald's QCP
formulation) — no eigendecomposition, pure VPU math, fully vectorized.

The optimal rotation (needed for the max-atom-deviation criterion and for
ensemble alignment) comes from the adjugate of (K - lambda*I): for a simple
top eigenvalue the adjugate is rank-1 = c*q*q^T, so its best column is the
quaternion. All functions support an optional per-atom weight vector, which
doubles as the padding mask for bucketed variable-size molecules.

Conventions: rotations are column-convention (R @ b ~ a); `rmsd_and_max`
mirrors the reference's prism_pruner.rmsd.rmsd_and_max call surface
(firecode/utils.py:587-597).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from firecode_tpu.ops.algebra import quaternion_to_matrix

_NEWTON_ITERS = 16


def center_coords(
    coords: jnp.ndarray, weights: jnp.ndarray | None = None
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Center structures at their (weighted) centroid.

    coords: [..., N, 3]. Returns (centered, g, wsum) where g = sum_n w_n
    |x_n|^2 (the QCP self-inner-product) and wsum = sum of weights.
    """
    n = coords.shape[-2]
    if weights is None:
        wsum = jnp.asarray(float(n), dtype=coords.dtype)
        centroid = jnp.mean(coords, axis=-2, keepdims=True)
        centered = coords - centroid
        g = jnp.sum(centered * centered, axis=(-2, -1))
    else:
        w = weights[..., :, None].astype(coords.dtype)
        wsum = jnp.sum(weights).astype(coords.dtype)
        centroid = jnp.sum(coords * w, axis=-2, keepdims=True) / wsum
        centered = (coords - centroid) * jnp.sqrt(w)
        # pre-scaling by sqrt(w) folds weights into all downstream inner
        # products, so the pairwise matmul needs no weight handling
        g = jnp.sum(centered * centered, axis=(-2, -1))
    return centered, g, wsum


def _det3(m: jnp.ndarray) -> jnp.ndarray:
    """Determinant of [..., 3, 3] via scalar triple product."""
    a, b, c = m[..., 0, :], m[..., 1, :], m[..., 2, :]
    return jnp.sum(a * jnp.cross(b, c), axis=-1)


def _det4(m: jnp.ndarray) -> jnp.ndarray:
    """Determinant of [..., 4, 4] via complementary 2x2 minors."""
    a = m
    s0 = a[..., 0, 0] * a[..., 1, 1] - a[..., 1, 0] * a[..., 0, 1]
    s1 = a[..., 0, 0] * a[..., 1, 2] - a[..., 1, 0] * a[..., 0, 2]
    s2 = a[..., 0, 0] * a[..., 1, 3] - a[..., 1, 0] * a[..., 0, 3]
    s3 = a[..., 0, 1] * a[..., 1, 2] - a[..., 1, 1] * a[..., 0, 2]
    s4 = a[..., 0, 1] * a[..., 1, 3] - a[..., 1, 1] * a[..., 0, 3]
    s5 = a[..., 0, 2] * a[..., 1, 3] - a[..., 1, 2] * a[..., 0, 3]
    c5 = a[..., 2, 2] * a[..., 3, 3] - a[..., 3, 2] * a[..., 2, 3]
    c4 = a[..., 2, 1] * a[..., 3, 3] - a[..., 3, 1] * a[..., 2, 3]
    c3 = a[..., 2, 1] * a[..., 3, 2] - a[..., 3, 1] * a[..., 2, 2]
    c2 = a[..., 2, 0] * a[..., 3, 3] - a[..., 3, 0] * a[..., 2, 3]
    c1 = a[..., 2, 0] * a[..., 3, 2] - a[..., 3, 0] * a[..., 2, 2]
    c0 = a[..., 2, 0] * a[..., 3, 1] - a[..., 3, 0] * a[..., 2, 1]
    return s0 * c5 - s1 * c4 + s2 * c3 + s3 * c2 - s4 * c1 + s5 * c0


def _qcp_key_matrix(s: jnp.ndarray) -> jnp.ndarray:
    """Horn/Kearsley 4x4 key matrix from the 3x3 correlation S = sum a b^T."""
    sxx, sxy, sxz = s[..., 0, 0], s[..., 0, 1], s[..., 0, 2]
    syx, syy, syz = s[..., 1, 0], s[..., 1, 1], s[..., 1, 2]
    szx, szy, szz = s[..., 2, 0], s[..., 2, 1], s[..., 2, 2]
    k00 = sxx + syy + szz
    k01 = syz - szy
    k02 = szx - sxz
    k03 = sxy - syx
    k11 = sxx - syy - szz
    k12 = sxy + syx
    k13 = szx + sxz
    k22 = -sxx + syy - szz
    k23 = syz + szy
    k33 = -sxx - syy + szz
    row0 = jnp.stack([k00, k01, k02, k03], axis=-1)
    row1 = jnp.stack([k01, k11, k12, k13], axis=-1)
    row2 = jnp.stack([k02, k12, k22, k23], axis=-1)
    row3 = jnp.stack([k03, k13, k23, k33], axis=-1)
    return jnp.stack([row0, row1, row2, row3], axis=-2)


def _qcp_lambda_max(s: jnp.ndarray, ga: jnp.ndarray, gb: jnp.ndarray) -> jnp.ndarray:
    """Largest eigenvalue of the QCP key matrix by Newton on the quartic.

    Characteristic polynomial: x^4 + c2 x^2 + c1 x + c0 with
    c2 = -2 tr(S^T S), c1 = -8 det(S), c0 = det(K). Start from the upper
    bound (ga+gb)/2; Newton converges monotonically to the top root.
    """
    c2 = -2.0 * jnp.sum(s * s, axis=(-2, -1))
    c1 = -8.0 * _det3(s)
    c0 = _det4(_qcp_key_matrix(s))

    lam0 = 0.5 * (ga + gb)

    def body(_, lam):
        lam2 = lam * lam
        p = lam2 * lam2 + c2 * lam2 + c1 * lam + c0
        dp = 4.0 * lam2 * lam + 2.0 * c2 * lam + c1
        # guard: dp ~ 0 only when lam ~ 0 (degenerate all-zero structures)
        step = p / jnp.where(jnp.abs(dp) > 1e-30, dp, jnp.inf)
        return lam - step

    return lax.fori_loop(0, _NEWTON_ITERS, body, lam0)


def _adjugate4(h: jnp.ndarray) -> jnp.ndarray:
    """Adjugate of [..., 4, 4] (for symmetric input, equals cofactor matrix).

    Fully scalar-expanded: static-index slices + elementwise FMAs only (no
    gathers, no small-matrix ops) so huge pairwise batches stay on the VPU.
    """
    e = [[h[..., i, j] for j in range(4)] for i in range(4)]

    def det3(rows, cols):
        (a0, a1, a2), (b0, b1, b2), (c0, c1, c2) = (
            [e[r][c] for c in cols] for r in rows
        )
        return (
            a0 * (b1 * c2 - b2 * c1)
            - a1 * (b0 * c2 - b2 * c0)
            + a2 * (b0 * c1 - b1 * c0)
        )

    rows_out = []
    for j in range(4):
        row = []
        for i in range(4):
            rows = [r for r in range(4) if r != i]
            cols = [c for c in range(4) if c != j]
            row.append(((-1.0) ** (i + j)) * det3(rows, cols))
        rows_out.append(jnp.stack(row, axis=-1))
    # adj[j, i] = cofactor[i, j]
    return jnp.stack(rows_out, axis=-2)


def _qcp_quaternion(s: jnp.ndarray, lam: jnp.ndarray) -> jnp.ndarray:
    """Top eigenvector (unit quaternion) of the key matrix for eigenvalue lam."""
    k = _qcp_key_matrix(s)
    h = k - lam[..., None, None] * jnp.eye(4, dtype=k.dtype)
    adj = _adjugate4(h)  # rank-1: c * q q^T; any strong column ~ q
    norms = jnp.sum(adj * adj, axis=-1)  # row norms (symmetric: rows ~ cols)
    best = jnp.argmax(norms, axis=-1)
    # branch-free row pick (gathers on huge pairwise batches are slow on TPU)
    q = jnp.zeros_like(adj[..., 0, :])
    for r in range(4):
        q = jnp.where((best == r)[..., None], adj[..., r, :], q)
    qn = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True))
    # degenerate (e.g. identical structures with lam multiplicity): fall back
    # to the identity rotation
    ident = jnp.zeros_like(q).at[..., 0].set(1.0)
    return jnp.where(qn > 1e-9, q / (qn + 1e-30), ident)


def qcp_rotation(s: jnp.ndarray, lam: jnp.ndarray) -> jnp.ndarray:
    """Optimal rotation matrix (R @ b ~ a) from correlation S = A^T B.

    The Kearsley eigen-quaternion rotates a onto b; the transpose gives the
    b-onto-a map this module's convention uses.
    """
    m = quaternion_to_matrix(_qcp_quaternion(s, lam))
    return jnp.swapaxes(m, -1, -2)


def _pairwise_correlation(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """All-pairs correlation S[i, j] = A_i^T B_j as one MXU matmul.

    a: [K, N, 3] centered; b: [L, N, 3] centered -> [K, L, 3, 3].
    """
    k, n, _ = a.shape
    l = b.shape[0]
    a2 = jnp.transpose(a, (0, 2, 1)).reshape(k * 3, n)
    b2 = jnp.transpose(b, (0, 2, 1)).reshape(l * 3, n)
    m = jnp.matmul(a2, b2.T, preferred_element_type=a.dtype)  # (K*3, L*3)
    return jnp.transpose(m.reshape(k, 3, l, 3), (0, 2, 1, 3))


def _rmsd_from_lambda(
    ga: jnp.ndarray, gb: jnp.ndarray, lam: jnp.ndarray, wsum: jnp.ndarray
) -> jnp.ndarray:
    return jnp.sqrt(jnp.maximum(ga + gb - 2.0 * lam, 0.0) / wsum)


def pairwise_rmsd(
    a: jnp.ndarray,
    b: jnp.ndarray,
    weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Minimum-RMSD matrix [K, L] between two stacks of structures.

    a: [K, N, 3], b: [L, N, 3] (raw, uncentered).
    """
    ac, ga, wsum = center_coords(a, weights)
    bc, gb, _ = center_coords(b, weights)
    s = _pairwise_correlation(ac, bc)
    lam = _qcp_lambda_max(s, ga[:, None], gb[None, :])
    return _rmsd_from_lambda(ga[:, None], gb[None, :], lam, wsum)


def pairwise_rmsd_maxdev(
    a: jnp.ndarray,
    b: jnp.ndarray,
    weights: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Min-RMSD matrix and max single-atom deviation matrix, both [K, L].

    The deviation uses the optimal superposition: max_n |R b_n - a_n| with
    weights only masking which atoms count (weight > 0).
    """
    ac, ga, wsum = center_coords(a, weights)
    bc, gb, _ = center_coords(b, weights)
    s = _pairwise_correlation(ac, bc)
    lam = _qcp_lambda_max(s, ga[:, None], gb[None, :])
    rmsd = _rmsd_from_lambda(ga[:, None], gb[None, :], lam, wsum)

    rot = qcp_rotation(s, lam)  # [K, L, 3, 3]
    # rotated B for every pair: [K, L, N, 3]
    b_rot = jnp.einsum("klxy,lny->klnx", rot, bc)
    dev = b_rot - ac[:, None, :, :]
    dev2 = jnp.sum(dev * dev, axis=-1)
    if weights is not None:
        # sqrt(w)-prescaled coords: undo the scale to get true deviations,
        # masked lanes (w = 0) contribute zero
        w = weights.astype(a.dtype)
        inv = jnp.where(w > 0, 1.0 / jnp.maximum(w, 1e-30), 0.0)
        dev2 = dev2 * inv
    maxdev = jnp.sqrt(jnp.max(dev2, axis=-1))
    return rmsd, maxdev


def rmsd_and_max(
    ref: jnp.ndarray, tgt: jnp.ndarray, weights: jnp.ndarray | None = None
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Single-pair (min RMSD, max deviation) — reference rmsd_and_max parity."""
    r, m = pairwise_rmsd_maxdev(ref[None], tgt[None], weights)
    return r[0, 0], m[0, 0]


def kabsch_align(
    coords: jnp.ndarray,
    ref: jnp.ndarray,
    weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Optimally superpose a stack of structures [B, N, 3] onto `ref` [N, 3].

    Returns rotated+centered coordinates (centroid at origin). Replaces the
    reference's prism_pruner.align_structures.
    """
    refc, _, _ = center_coords(ref, weights)
    bc, _, _ = center_coords(coords, weights)
    if weights is not None:
        # undo sqrt(w) prescale: we want true coords back after rotation
        w = weights[:, None].astype(coords.dtype)
        inv_sqrt = jnp.where(w > 0, 1.0 / jnp.sqrt(jnp.maximum(w, 1e-30)), 0.0)
    s = jnp.einsum("na,bnc->bac", refc, bc)  # ref^T B_b per structure
    lam = _qcp_lambda_max(
        s,
        jnp.sum(refc * refc),
        jnp.sum(bc * bc, axis=(-2, -1)),
    )
    rot = qcp_rotation(s, lam)  # [B, 3, 3]
    out = jnp.einsum("bxy,bny->bnx", rot, bc)
    if weights is not None:
        out = out * inv_sqrt
    return out
