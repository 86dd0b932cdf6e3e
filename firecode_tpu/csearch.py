"""Batched torsion-driven conformer search.

The reference's csearch (firecode/torsion_module.py:436-891) walks the
dihedral angle grid one conformer at a time, rotating one torsion at a time
with a sequential -5 degree back-off loop on clash. Here the WHOLE angle grid
is one device batch:

- torsions are discovered on host (firecode_tpu.torsions) and lowered to
  quadruplet/mask arrays;
- the candidate axis (angle combinations) is the batch dimension; each torsion
  is applied to all candidates at once;
- the clash back-off becomes a while_loop that, per lane, selects the first
  clash-free angle among {a, a-5, a-10, ...} — the loop exits as soon as every
  lane has resolved, so the common no-clash case costs one iteration;
- TFD dedup runs as the blockwise device prune (firecode_tpu.prune).

Semantics match the reference: a lane whose rotation cannot be made clash-free
is fully undone for that torsion, and candidates where no bond rotated are
dropped.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from firecode_tpu.errors import SegmentedGraphError
from firecode_tpu.graphs import graphize
from firecode_tpu.prune.cascade import prune_by_tfd
from firecode_tpu.torsions import Torsion, find_torsions, sort_torsions_outward

_BACKOFF_STEP = 5.0
_CLASH_THR = 1.5


def _torsion_masks(torsions: Sequence[Torsion], n_atoms: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    quads = np.array([t.quadruplet for t in torsions], dtype=np.int32)
    moving = np.stack([t.mask for t in torsions])
    static = np.zeros_like(moving)
    for k, t in enumerate(torsions):
        s = ~moving[k]
        s[t.i2] = False
        s[t.i3] = False
        static[k] = s
    return quads, moving, static


@partial(jax.jit, static_argnames=("n_torsions",))
def _drive_torsions(
    coords0: jnp.ndarray,  # [N, 3]
    quads: jnp.ndarray,  # i32[T, 4]
    moving: jnp.ndarray,  # bool[T, N]
    static: jnp.ndarray,  # bool[T, N]
    angles: jnp.ndarray,  # f[C, T]
    n_torsions: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Apply per-candidate angle sets torsion-by-torsion with clash back-off.

    Returns (coords [C, N, 3], n_rotated [C]).
    """
    from firecode_tpu.ops.torsion_ops import rotate_dihedral

    c = angles.shape[0]
    coords = jnp.broadcast_to(coords0, (c, *coords0.shape))
    n_rotated = jnp.zeros((c,), dtype=jnp.int32)

    def clash_free(crd, mov, stat):
        diff = crd[:, :, None, :] - crd[:, None, :, :]
        d2 = jnp.sum(diff * diff, axis=-1)
        pair = mov[None, :] & stat[:, None]
        close = (d2 < _CLASH_THR * _CLASH_THR) & pair
        return jnp.sum(close, axis=(-2, -1)) == 0

    for t in range(n_torsions):
        quad = quads[t]
        mov = moving[t]
        stat = static[t]
        a = angles[:, t]
        k_max = jnp.floor(jnp.abs(a) / _BACKOFF_STEP).astype(jnp.int32)
        sign = jnp.sign(a)

        def cond(carry):
            k, found, _ = carry
            return jnp.any(~found & (k <= k_max)) & (k <= jnp.max(k_max))

        def body(carry):
            k, found, chosen = carry
            test = a - sign * _BACKOFF_STEP * k
            rotated = rotate_dihedral(coords, quad, test, mov)
            ok = clash_free(rotated, mov, stat) & (k <= k_max)
            newly = ~found & ok
            chosen = jnp.where(newly, test, chosen)
            return k + 1, found | ok, chosen

        zero = jnp.zeros_like(a)
        _, found, chosen = lax.while_loop(
            cond, body, (jnp.asarray(0, jnp.int32), jnp.zeros((c,), bool), zero)
        )
        chosen = jnp.where(found, chosen, zero)
        coords = rotate_dihedral(coords, quad, chosen, mov)
        n_rotated = n_rotated + (found & (a != 0)).astype(jnp.int32)

    return coords, n_rotated


def _angle_grid(
    torsions: Sequence[Torsion],
    rng: np.random.Generator,
    max_candidates: int,
    shuffle: bool,
) -> np.ndarray:
    sets = [np.asarray(t.get_angles(), dtype=np.float64) for t in torsions]
    total = int(np.prod([len(s) for s in sets]))
    if total <= max_candidates:
        grid = np.stack(np.meshgrid(*sets, indexing="ij"), -1).reshape(-1, len(sets))
        if shuffle:
            rng.shuffle(grid)
        return grid
    # too many combinations: sample without materializing the product
    cols = [s[rng.integers(0, len(s), size=max_candidates)] for s in sets]
    grid = np.stack(cols, axis=1)
    return np.unique(grid, axis=0)


def csearch(
    atomnos: np.ndarray,
    coords: np.ndarray,
    constrained_indices: Sequence[tuple[int, int]] | None = None,
    keep_hb: bool = False,
    n_out: int = 100,
    mode: int = 1,
    max_candidates: int = 65536,
    tfd_thresh: float = 10.0,
    title: str = "molecule",
    logfunction: Callable[[str], None] | None = None,
    seed: int = 0,
) -> np.ndarray:
    """Torsion-driven conformer generation -> [B, N, 3] (B <= n_out).

    mode 0/1: clustered (systematic angle grid); mode 2: random sampling.
    Mirrors the reference csearch contract (firecode/torsion_module.py:589-723).
    """
    atomnos = np.asarray(atomnos)
    coords = np.asarray(coords, dtype=np.float64)
    rng = np.random.default_rng(seed)
    log = logfunction or (lambda s: None)

    graph = graphize(atomnos, coords)
    constrained_indices = list(constrained_indices or [])
    for i, j in constrained_indices:
        graph.add_edge(int(i), int(j))

    hydrogen_bonds: list[tuple[int, int]] = []
    if keep_hb:
        hydrogen_bonds = find_hydrogen_bonds(atomnos, coords, graph)
        for hb in hydrogen_bonds:
            graph.add_edge(*hb)

    import networkx as nx

    fragments = list(nx.connected_components(graph))
    if len(fragments) > 1:
        msg = (
            f"{title} has a segmented connectivity graph: check the input geometry "
            "or add constraints/hydrogen bonds linking the fragments."
        )
        if keep_hb:
            raise SegmentedGraphError(msg)
        inter_hbs = find_hydrogen_bonds(atomnos, coords, graph, fragments=fragments)
        if not inter_hbs:
            raise SegmentedGraphError(msg)
        for hb in inter_hbs:
            graph.add_edge(*hb)
        hydrogen_bonds.extend(inter_hbs)
        if len(list(nx.connected_components(graph))) > 1:
            raise SegmentedGraphError(msg)

    torsions = find_torsions(graph, atomnos, coords, hydrogen_bonds)
    torsions = sort_torsions_outward(torsions, graph, constrained_indices)
    if not torsions:
        log(f"No rotable bonds found for {title}.")
        return coords[None]

    log(f"--> CSearch on {title}: {len(torsions)} torsions")
    for t in torsions:
        log(f"    {t.quadruplet} : {t.n_fold}-fold")

    angles = _angle_grid(torsions, rng, max_candidates, shuffle=(mode == 2))
    if mode == 2 and len(angles) > 4 * n_out:
        angles = angles[: 4 * n_out]

    quads, moving, static = _torsion_masks(torsions, len(atomnos))
    out, n_rotated = _drive_torsions(
        jnp.asarray(coords),
        jnp.asarray(quads),
        jnp.asarray(moving),
        jnp.asarray(static),
        jnp.asarray(angles),
        len(torsions),
    )
    out = np.asarray(out)
    n_rotated = np.asarray(n_rotated)

    # keep the input conformation + candidates where something rotated
    out = np.concatenate([coords[None], out[n_rotated > 0]])

    keep = prune_by_tfd(out, quads, thresh=tfd_thresh)
    out = out[keep]
    log(f"    {len(out)} conformers after TFD dedup")

    if len(out) > n_out:
        idx = np.sort(rng.choice(len(out), size=n_out, replace=False))
        out = out[idx]
    return out


def find_hydrogen_bonds(
    atomnos: np.ndarray,
    coords: np.ndarray,
    graph,
    d_min: float = 2.5,
    d_max: float = 3.3,
    max_angle: float = 45.0,
    donor_elements: Sequence[str] = ("N", "O"),
    acceptor_elements: Sequence[str] = ("N", "O", "F"),
    fragments: Sequence[set] | None = None,
) -> list[tuple[int, int]]:
    """Hydrogen-bond partner pairs (H, acceptor), optionally inter-fragment
    only. Mirrors firecode/torsion_module.py:273-351."""
    from firecode_tpu.pt import symbols_from_atomnos

    symbols = symbols_from_atomnos(atomnos)
    donors = [i for i, s in enumerate(symbols) if s in donor_elements]
    acceptors = [i for i, s in enumerate(symbols) if s in acceptor_elements]
    out: list[tuple[int, int]] = []
    for i1 in donors:
        for i2 in acceptors:
            if i1 == i2:
                continue
            if fragments is not None and any(i1 in f and i2 in f for f in fragments):
                continue
            d = float(np.linalg.norm(coords[i1] - coords[i2]))
            if not (d_min < d < d_max):
                continue
            hs = [h for h in graph.neighbors(i1) if symbols[h] == "H"]
            versor = coords[i2] - coords[i1]
            versor /= np.linalg.norm(versor)
            for ih in hs:
                v1 = coords[ih] - coords[i1]
                v2 = coords[ih] - coords[i2]
                l1 = v1 @ versor
                l2 = v2 @ -versor
                ref_v, ref_d = (v1, versor) if l1 < l2 else (v2, -versor)
                cos = np.clip(
                    ref_v @ ref_d / (np.linalg.norm(ref_v) + 1e-12), -1.0, 1.0
                )
                alfa = np.degrees(np.arccos(cos))
                if alfa < max_angle:
                    pair = (ih, i2) if np.linalg.norm(v1) < np.linalg.norm(v2) else (ih, i1)
                    out.append(tuple(sorted(int(x) for x in pair)))
                    break
    return sorted(set(out))
