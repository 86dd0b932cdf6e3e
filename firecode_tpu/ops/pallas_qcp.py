"""Pallas TPU kernel: fused all-pairs QCP minimum-RMSD tiles.

The jnp path (firecode_tpu.ops.rmsd.pairwise_rmsd) materializes the (K, L, 3,
3) correlation tensor in HBM between the matmul and the Newton stage unless
XLA fuses it. This kernel keeps everything on-chip: for each (128 x 128) pair
tile it runs the nine (BK, N) @ (N, BL) correlation matmuls on the MXU with
accumulators in VMEM, then evaluates the QCP characteristic-quartic Newton
iteration and the RMSD formula as the epilogue — only the final (BK, BL) RMSD
tile is written to HBM. HBM traffic per tile drops from 10 to 1 matrices.

Used as the fast path for rmsd-only pruning and as the building block for
very large pairwise screens; falls back to interpret mode off-TPU (tests).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

# Newton iterations for the QCP quartic root, started at lam0 = (ga+gb)/2
# >= lam_max (monotone convergence from above). Measured against the f64
# oracle (near-duplicates + random 50-atom pairs): for SIMILAR pairs
# (rmsd < 1.5 A — everything a prune threshold ever examines) the error is
# 2.2e-3 A at EVERY count from 6 to 16 — the f32 correlation floor, not
# Newton truncation. Truncation only shows in the far field (rmsd >> thr):
# max 0.19 A at N=8 vs 2.2e-3 at N=16, where values are decision-
# irrelevant. N=8 cuts the VPU epilogue ~2x (46.0 -> 37.7 ms on the
# 8192^2 tile benchmark, v5e); raise FIRECODE_QCP_NEWTON for far-field
# value accuracy.
_NEWTON_ITERS = int(os.environ.get("FIRECODE_QCP_NEWTON", "8"))


def _unify_vma(*arrays):
    """Promote all operands to a common varying-manual-axes set.

    Under shard_map the cascade hands the kernel a VARYING column block and
    a REPLICATED (psum-broadcast) row block; pallas_call requires operands
    to agree, so replicated operands are pcast to the union."""
    vmas = [getattr(jax.typeof(a), "vma", frozenset()) for a in arrays]
    target = frozenset().union(*vmas)
    if not target:
        return arrays
    out = []
    for a, v in zip(arrays, vmas):
        missing = tuple(sorted(target - v))
        out.append(jax.lax.pcast(a, missing, to="varying") if missing else a)
    return tuple(out)
BK = int(os.environ.get("FIRECODE_QCP_BK", "256"))
BL = int(os.environ.get("FIRECODE_QCP_BL", "256"))
# the quaternion-emitting kernel carries ~3x more live planes (key-matrix
# entries + adjugate rows); smaller tiles keep it comfortably inside VMEM
BKQ = 128
BLQ = 128


def _quartic_from_planes(s):
    """QCP characteristic-quartic coefficients + key-matrix entries from the
    9 correlation planes. s: dict[(x,y)] -> (BK, BL). Returns (c2, c1, c0, k)
    with k a dict of the 10 distinct symmetric key entries."""
    sxx, sxy, sxz = s[0, 0], s[0, 1], s[0, 2]
    syx, syy, syz = s[1, 0], s[1, 1], s[1, 2]
    szx, szy, szz = s[2, 0], s[2, 1], s[2, 2]

    c2 = -2.0 * (
        sxx * sxx + sxy * sxy + sxz * sxz
        + syx * syx + syy * syy + syz * syz
        + szx * szx + szy * szy + szz * szz
    )
    c1 = -8.0 * (
        sxx * (syy * szz - syz * szy)
        - sxy * (syx * szz - syz * szx)
        + sxz * (syx * szy - syy * szx)
    )

    # det of the 4x4 key matrix, expanded in terms of the S entries
    k = {}
    k[0, 0] = sxx + syy + szz
    k[0, 1] = syz - szy
    k[0, 2] = szx - sxz
    k[0, 3] = sxy - syx
    k[1, 1] = sxx - syy - szz
    k[1, 2] = sxy + syx
    k[1, 3] = szx + sxz
    k[2, 2] = -sxx + syy - szz
    k[2, 3] = syz + szy
    k[3, 3] = -sxx - syy + szz

    # complementary-2x2-minors determinant of the symmetric key matrix
    s0 = k[0, 0] * k[1, 1] - k[0, 1] * k[0, 1]
    s1 = k[0, 0] * k[1, 2] - k[0, 1] * k[0, 2]
    s2 = k[0, 0] * k[1, 3] - k[0, 1] * k[0, 3]
    s3 = k[0, 1] * k[1, 2] - k[1, 1] * k[0, 2]
    s4 = k[0, 1] * k[1, 3] - k[1, 1] * k[0, 3]
    s5 = k[0, 2] * k[1, 3] - k[1, 2] * k[0, 3]
    c5 = k[2, 2] * k[3, 3] - k[2, 3] * k[2, 3]
    c4 = k[1, 2] * k[3, 3] - k[2, 3] * k[1, 3]
    c3 = k[1, 2] * k[2, 3] - k[2, 2] * k[1, 3]
    c2m = k[0, 2] * k[3, 3] - k[2, 3] * k[0, 3]
    c1m = k[0, 2] * k[2, 3] - k[2, 2] * k[0, 3]
    c0m = k[0, 2] * k[1, 3] - k[1, 2] * k[0, 3]
    c0 = s0 * c5 - s1 * c4 + s2 * c3 + s3 * c2m - s4 * c1m + s5 * c0m
    return c2, c1, c0, k


_NEWTON_UNROLL = os.environ.get("FIRECODE_QCP_UNROLL", "1") != "0"


def _newton_lambda(c2, c1, c0, lam0):
    def body(_, lam):
        lam2 = lam * lam
        p = lam2 * lam2 + c2 * lam2 + c1 * lam + c0
        dp = 4.0 * lam2 * lam + 2.0 * c2 * lam + c1
        step = p / jnp.where(jnp.abs(dp) > 1e-30, dp, jnp.inf)
        return lam - step

    if _NEWTON_UNROLL:
        # static unroll: inside a Pallas kernel the fori_loop carries
        # per-iteration control overhead on big VPU tiles
        lam = lam0
        for _ in range(_NEWTON_ITERS):
            lam = body(0, lam)
        return lam
    return jax.lax.fori_loop(0, _NEWTON_ITERS, body, lam0)


def _qcp_epilogue(s, ga, gb, wsum):
    """rmsd tile from the 9 correlation planes. s: dict[(x,y)] -> (BK, BL)."""
    c2, c1, c0, _ = _quartic_from_planes(s)
    lam = _newton_lambda(c2, c1, c0, 0.5 * (ga + gb))
    return jnp.sqrt(jnp.maximum(ga + gb - 2.0 * lam, 0.0) / wsum)


def _quaternion_planes(kents, lam):
    """Top eigen-quaternion of the key matrix as four (BK, BL) planes.

    Scalar-expanded mirror of ops.rmsd._qcp_quaternion: adjugate of
    H = K - lam*I is rank-1 = c*q*q^T; pick its strongest row branchlessly.
    """
    e = [[kents[min(i, j), max(i, j)] for j in range(4)] for i in range(4)]
    for i in range(4):
        e[i][i] = e[i][i] - lam

    def det3(rows, cols):
        (a0, a1, a2), (b0, b1, b2), (c0, c1, c2) = (
            [e[r][c] for c in cols] for r in rows
        )
        return (
            a0 * (b1 * c2 - b2 * c1)
            - a1 * (b0 * c2 - b2 * c0)
            + a2 * (b0 * c1 - b1 * c0)
        )

    best_q = None
    best_n = None
    for j in range(4):
        row = []
        for i in range(4):
            rows = [r for r in range(4) if r != i]
            cols = [c for c in range(4) if c != j]
            row.append(((-1.0) ** (i + j)) * det3(rows, cols))
        norm2 = row[0] * row[0] + row[1] * row[1] + row[2] * row[2] + row[3] * row[3]
        if best_q is None:
            best_q, best_n = row, norm2
        else:
            pick = norm2 > best_n
            best_q = [jnp.where(pick, r, b) for r, b in zip(row, best_q)]
            best_n = jnp.maximum(norm2, best_n)
    qn = jnp.sqrt(best_n)
    ok = qn > 1e-9
    inv = 1.0 / (qn + 1e-30)
    # degenerate (identical structures): identity quaternion
    w = jnp.where(ok, best_q[0] * inv, 1.0)
    x = jnp.where(ok, best_q[1] * inv, 0.0)
    y = jnp.where(ok, best_q[2] * inv, 0.0)
    z = jnp.where(ok, best_q[3] * inv, 0.0)
    return w, x, y, z


_ONE_MATMUL = os.environ.get("FIRECODE_QCP_ONE_MATMUL", "1") != "0"


def _kernel(ax, ay, az, bx, by, bz, ga, gb, wsum_ref, out):
    planes = {}
    a_planes = (ax[:], ay[:], az[:])
    b_planes = (bx[:], by[:], bz[:])
    if _ONE_MATMUL:
        # ONE (3BK, N) @ (N, 3BL) MXU launch instead of nine (BK, N) @
        # (N, BL): the small matmuls under-fill the systolic pipeline
        # (measured 30.9 -> see bench A/B); the 9 planes are static slices
        # of the fused product
        abig = jnp.concatenate(a_planes, axis=0)
        bbig = jnp.concatenate(b_planes, axis=0)
        prod = jnp.dot(abig, bbig.T, preferred_element_type=jnp.float32)
        bk = ax.shape[0]
        bl = bx.shape[0]
        for x in range(3):
            for y in range(3):
                planes[x, y] = prod[x * bk:(x + 1) * bk, y * bl:(y + 1) * bl]
    else:
        for x in range(3):
            for y in range(3):
                planes[x, y] = jnp.dot(
                    a_planes[x], b_planes[y].T,
                    preferred_element_type=jnp.float32,
                )
    ga_col = ga[0, :][:, None]  # (BK, 1)
    gb_row = gb[0, :][None, :]  # (1, BL)
    out[:] = _qcp_epilogue(planes, ga_col, gb_row, wsum_ref[0, 0])


def _kernel_quat(
    ax, ay, az, bx, by, bz, ga, gb, wsum_ref, thr_ref,
    out_r, out_w, out_x, out_y, out_z,
):
    """RMSD tile + optimal-rotation quaternion planes (for the max-deviation
    criterion downstream — no correlation recompute needed). The adjugate
    epilogue only runs when the tile holds at least one rmsd < thr pair."""
    planes = {}
    a_planes = (ax[:], ay[:], az[:])
    b_planes = (bx[:], by[:], bz[:])
    for x in range(3):
        for y in range(3):
            planes[x, y] = jnp.dot(
                a_planes[x], b_planes[y].T, preferred_element_type=jnp.float32
            )
    ga_col = ga[0, :][:, None]  # (BKQ, 1)
    gb_row = gb[0, :][None, :]  # (1, BLQ)
    c2, c1, c0, kents = _quartic_from_planes(planes)
    lam = _newton_lambda(c2, c1, c0, 0.5 * (ga_col + gb_row))
    rmsd = jnp.sqrt(jnp.maximum(ga_col + gb_row - 2.0 * lam, 0.0) / wsum_ref[0, 0])
    out_r[:] = rmsd
    out_w[:] = jnp.ones_like(rmsd)
    out_x[:] = jnp.zeros_like(rmsd)
    out_y[:] = jnp.zeros_like(rmsd)
    out_z[:] = jnp.zeros_like(rmsd)

    @pl.when(jnp.any(rmsd < thr_ref[0, 0]))
    def _():
        w, x, y, z = _quaternion_planes(kents, lam)
        out_w[:] = w
        out_x[:] = x
        out_y[:] = y
        out_z[:] = z


@partial(jax.jit, static_argnames=("interpret",))
def _pairwise_rmsd_pallas_padded(
    a_planes, b_planes, ga, gb, wsum, interpret: bool
):
    """a_planes/b_planes: f32[3, K, N]; ga: f32[1, K]; gb: f32[1, L]."""
    a_planes, b_planes, ga, gb, wsum = _unify_vma(a_planes, b_planes, ga, gb, wsum)
    _, k, n = a_planes.shape
    l = b_planes.shape[1]
    grid = (k // BK, l // BL)

    def a_spec(_):
        return pl.BlockSpec((BK, n), lambda i, j: (i, 0))

    def b_spec(_):
        return pl.BlockSpec((BL, n), lambda i, j: (j, 0))

    vma = getattr(jax.typeof(ga), "vma", frozenset())
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            a_spec(0), a_spec(1), a_spec(2),
            b_spec(0), b_spec(1), b_spec(2),
            pl.BlockSpec((1, BK), lambda i, j: (0, i)),
            pl.BlockSpec((1, BL), lambda i, j: (0, j)),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((BK, BL), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((k, l), jnp.float32, vma=vma),
        interpret=interpret,
    )(
        a_planes[0], a_planes[1], a_planes[2],
        b_planes[0], b_planes[1], b_planes[2],
        ga, gb, wsum,
    )


@partial(jax.jit, static_argnames=("interpret",))
def _pairwise_rmsd_quat_pallas_padded(a_planes, b_planes, ga, gb, wsum, thr, interpret: bool):
    """Like _pairwise_rmsd_pallas_padded but emits (rmsd, qw, qx, qy, qz)."""
    a_planes, b_planes, ga, gb, wsum, thr = _unify_vma(
        a_planes, b_planes, ga, gb, wsum, thr
    )
    _, k, n = a_planes.shape
    l = b_planes.shape[1]
    grid = (k // BKQ, l // BLQ)

    out_tile = pl.BlockSpec((BKQ, BLQ), lambda i, j: (i, j))
    # under shard_map with vma checking, outputs must declare how they vary
    # across mesh axes; inherit the input's vma (empty outside shard_map)
    vma = getattr(jax.typeof(ga), "vma", frozenset())
    out_struct = jax.ShapeDtypeStruct((k, l), jnp.float32, vma=vma)
    return pl.pallas_call(
        _kernel_quat,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BKQ, n), lambda i, j: (i, 0)),
            pl.BlockSpec((BKQ, n), lambda i, j: (i, 0)),
            pl.BlockSpec((BKQ, n), lambda i, j: (i, 0)),
            pl.BlockSpec((BLQ, n), lambda i, j: (j, 0)),
            pl.BlockSpec((BLQ, n), lambda i, j: (j, 0)),
            pl.BlockSpec((BLQ, n), lambda i, j: (j, 0)),
            pl.BlockSpec((1, BKQ), lambda i, j: (0, i)),
            pl.BlockSpec((1, BLQ), lambda i, j: (0, j)),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0)),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0)),
        ],
        out_specs=[out_tile] * 5,
        out_shape=[out_struct] * 5,
        interpret=interpret,
    )(
        a_planes[0], a_planes[1], a_planes[2],
        b_planes[0], b_planes[1], b_planes[2],
        ga, gb, wsum, thr,
    )


def pallas_rmsd_quat_tile(
    ac: jnp.ndarray,
    ga: jnp.ndarray,
    bc: jnp.ndarray,
    gb: jnp.ndarray,
    wsum,
    thr=None,
    interpret: bool | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused (RMSD, rotation-quaternion) tiles from ALREADY-CENTERED coords.

    Same contract as pallas_rmsd_tile, plus a [K, L, 4] unit quaternion per
    pair (column convention: R(q)^T @ b ~ a, cf. ops.rmsd.qcp_rotation) so the
    max-deviation criterion needs no correlation recompute (VERDICT r2 #5).
    Tiles with no rmsd < thr pair skip the adjugate epilogue and return the
    identity quaternion; pass thr=None to always emit true quaternions.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)
    k, n, _ = ac.shape
    l = bc.shape[0]
    kp = -(-k // BKQ) * BKQ
    lp = -(-l // BLQ) * BLQ
    npad = -(-n // 128) * 128

    def planes(c, rows, rows_pad):
        p = jnp.transpose(c.astype(jnp.float32), (2, 0, 1))
        return jnp.pad(p, ((0, 0), (0, rows_pad - rows), (0, npad - n)))

    thr_v = jnp.inf if thr is None else thr
    # padded rows carry a huge self-norm so their (zero-coordinate) pairs read
    # as huge rmsd — otherwise every padded pair has rmsd 0 and defeats the
    # any-close gate of the adjugate epilogue
    r, w, x, y, z = _pairwise_rmsd_quat_pallas_padded(
        planes(ac, k, kp),
        planes(bc, l, lp),
        jnp.pad(ga.astype(jnp.float32), (0, kp - k), constant_values=1e12)[None, :],
        jnp.pad(gb.astype(jnp.float32), (0, lp - l), constant_values=1e12)[None, :],
        jnp.full((1, 1), wsum, jnp.float32),
        jnp.full((1, 1), thr_v, jnp.float32),
        interpret,
    )
    quat = jnp.stack([w[:k, :l], x[:k, :l], y[:k, :l], z[:k, :l]], axis=-1)
    return r[:k, :l].astype(ac.dtype), quat.astype(ac.dtype)


@partial(jax.jit, static_argnames=("interpret",))
def _prep_and_run(a: jnp.ndarray, b: jnp.ndarray, interpret: bool) -> jnp.ndarray:
    """Centering, plane layout, padding and the kernel, all under one jit
    (eager per-op dispatch is expensive on tunneled backends)."""
    from firecode_tpu.ops.rmsd import center_coords

    k, n, _ = a.shape
    l = b.shape[0]
    ac, ga, wsum = center_coords(a)
    bc, gb, _ = center_coords(b)

    kp = -(-k // BK) * BK
    lp = -(-l // BL) * BL
    npad = -(-n // 128) * 128

    def planes(c, rows, rows_pad):
        # [rows, n, 3] -> [3, rows_pad, npad]; padded atoms contribute zero
        p = jnp.transpose(c, (2, 0, 1))
        return jnp.pad(p, ((0, 0), (0, rows_pad - rows), (0, npad - n)))

    out = _pairwise_rmsd_pallas_padded(
        planes(ac, k, kp),
        planes(bc, l, lp),
        jnp.pad(ga, (0, kp - k))[None, :],
        jnp.pad(gb, (0, lp - l))[None, :],
        jnp.full((1, 1), wsum, jnp.float32),
        interpret,
    )
    return out[:k, :l]


def pallas_rmsd_tile(
    ac: jnp.ndarray,
    ga: jnp.ndarray,
    bc: jnp.ndarray,
    gb: jnp.ndarray,
    wsum,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused RMSD tile from ALREADY-CENTERED coordinates (cascade fast path).

    ac: [K, N, 3] centered (optionally sqrt(w)-prescaled), ga: [K] squared
    norms, likewise bc/gb; wsum as in ops.rmsd.center_coords. Jit/loop-safe:
    this is what prune/cascade.py calls inside its blockwise greedy engine,
    so the (K, L, 3, 3) correlation tensor of the jnp path never exists.
    Returns [K, L] in the input dtype (kernel math is f32).
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)
    k, n, _ = ac.shape
    l = bc.shape[0]
    kp = -(-k // BK) * BK
    lp = -(-l // BL) * BL
    npad = -(-n // 128) * 128

    def planes(c, rows, rows_pad):
        p = jnp.transpose(c.astype(jnp.float32), (2, 0, 1))
        return jnp.pad(p, ((0, 0), (0, rows_pad - rows), (0, npad - n)))

    out = _pairwise_rmsd_pallas_padded(
        planes(ac, k, kp),
        planes(bc, l, lp),
        jnp.pad(ga.astype(jnp.float32), (0, kp - k))[None, :],
        jnp.pad(gb.astype(jnp.float32), (0, lp - l))[None, :],
        jnp.full((1, 1), wsum, jnp.float32),
        interpret,
    )
    return out[:k, :l].astype(ac.dtype)


def pairwise_rmsd_pallas(
    a: jnp.ndarray, b: jnp.ndarray, interpret: bool | None = None
) -> jnp.ndarray:
    """Minimum-RMSD matrix [K, L] via the fused Pallas tile kernel.

    a: [K, N, 3], b: [L, N, 3] (raw coordinates; centering done here).
    Pads K/L to 128 and N to the lane width; returns the unpadded matrix.
    Unlike the plain jnp path, the (K, L, 3, 3) correlation tensor is never
    materialized, so the full matrix fits at sizes where the XLA path OOMs
    (e.g. 25 GB at K = L = 4096).
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    return _prep_and_run(a, b, interpret)
