"""Pairwise-distance clash and compenetration kernels.

Replaces the reference's cdist-based checks (firecode/algebra.py:52,
firecode/utils.py:600-648, firecode/torsion_module.py:894-918) with batched
on-device math. Each returns per-structure counts/bools for a whole batch, so
clash filtering after embedding/torsion-driving is one fused evaluation.
"""

from __future__ import annotations

import jax.numpy as jnp


def pairwise_dist2(coords: jnp.ndarray) -> jnp.ndarray:
    """Squared distances between all atom pairs. [..., N, 3] -> [..., N, N]."""
    diff = coords[..., :, None, :] - coords[..., None, :, :]
    return jnp.sum(diff * diff, axis=-1)


def count_clashes(
    coords: jnp.ndarray,
    thr: float = 0.5,
    atom_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Number of atom pairs closer than thr Angstrom (excluding self-pairs).

    coords: [..., N, 3] -> int32 [...]. Counts ordered pairs (i != j), matching
    the reference's count_nonzero over a full cdist matrix.
    """
    d2 = pairwise_dist2(coords)
    n = coords.shape[-2]
    close = (d2 < thr * thr) & ~jnp.eye(n, dtype=bool)
    if atom_mask is not None:
        pair_ok = atom_mask[:, None] & atom_mask[None, :]
        close = close & pair_ok
    return jnp.sum(close, axis=(-2, -1)).astype(jnp.int32)


def compenetration_ok(
    coords: jnp.ndarray,
    frag_ids: jnp.ndarray,
    thr: float = 1.5,
    max_clashes: int = 0,
    atom_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """True where structures have <= max_clashes inter-fragment contacts < thr.

    coords: [..., N, 3]; frag_ids: i32[N] fragment id per atom (padding ok via
    atom_mask). Counts unordered inter-fragment pairs, mirroring the
    fragment-block cdist counting of the reference (firecode/utils.py:600-648).
    """
    d2 = pairwise_dist2(coords)
    inter = frag_ids[:, None] != frag_ids[None, :]
    close = (d2 < thr * thr) & inter
    if atom_mask is not None:
        close = close & (atom_mask[:, None] & atom_mask[None, :])
    # unordered pairs: the matrix is symmetric, halve the count
    n_clash = jnp.sum(close, axis=(-2, -1)) // 2
    return n_clash <= max_clashes


def torsion_comp_ok(
    coords: jnp.ndarray,
    moving_mask: jnp.ndarray,
    static_mask: jnp.ndarray,
    thr: float = 1.5,
    max_clashes: int = 0,
) -> jnp.ndarray:
    """True where rotated-side atoms don't crash into the static side.

    coords: [..., N, 3]; moving/static masks: bool[N] (precomputed per torsion
    with the axis atoms excluded, reference torsion_module.py:894-918).
    """
    d2 = pairwise_dist2(coords)
    pair = moving_mask[None, :] & static_mask[:, None]
    close = (d2 < thr * thr) & pair
    return jnp.sum(close, axis=(-2, -1)) <= max_clashes
