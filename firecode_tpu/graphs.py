"""Host-side molecular graph perception.

Graphs are small (O(100) nodes) and inherently irregular, so they stay on the
host (networkx) exactly as the reference keeps them (SURVEY.md section 2.2,
networkx row). Everything a device kernel needs is lowered to index arrays and
boolean masks before launch.

Replaces the prism_pruner graph call-surface: graphize, d_min_bond, get_sp_n,
is_amide_n, is_ester_o, get_phenyl_ids, get_double_bonds_indices, plus the
reference's firecode/graph_manipulations.py helpers.
"""

from __future__ import annotations

from typing import Iterable, Sequence

import networkx as nx
import numpy as np

from firecode_tpu.pt import COVALENT_RADII, atomnos_from_symbols, symbols_from_atomnos

BOND_FACTOR = 1.2  # bond if d < factor * (r_i + r_j)
DOUBLE_BOND_FACTOR = 0.89  # clearly shortened bonds are taken as double


def d_min_bond(z1: int, z2: int, factor: float = BOND_FACTOR) -> float:
    """Max distance at which two elements are considered bonded."""
    return factor * (COVALENT_RADII[z1] + COVALENT_RADII[z2])


def graphize(
    atomnos_or_atoms: np.ndarray,
    coords: np.ndarray,
    factor: float = BOND_FACTOR,
) -> nx.Graph:
    """Distance-based bond perception -> networkx Graph.

    Nodes carry an "atoms" attribute (element symbol) for parity with the
    reference graph contract (firecode/torsion_module.py node_match usage).
    """
    atomnos = _as_atomnos(atomnos_or_atoms)
    coords = np.asarray(coords, dtype=np.float64)
    n = len(atomnos)
    radii = COVALENT_RADII[atomnos]
    diff = coords[:, None, :] - coords[None, :, :]
    dists = np.sqrt(np.sum(diff * diff, axis=-1))
    cutoff = factor * (radii[:, None] + radii[None, :])
    bonded = (dists < cutoff) & ~np.eye(n, dtype=bool)

    graph = nx.Graph()
    symbols = symbols_from_atomnos(atomnos)
    for i in range(n):
        graph.add_node(i, atoms=str(symbols[i]))
    for i, j in zip(*np.where(np.triu(bonded, k=1))):
        graph.add_edge(int(i), int(j))
    return graph


def _as_atomnos(atomnos_or_atoms: np.ndarray) -> np.ndarray:
    arr = np.asarray(atomnos_or_atoms)
    if arr.dtype.kind in "US":
        return atomnos_from_symbols(arr)
    return arr.astype(np.int64)


def get_double_bonds_indices(
    atomnos_or_atoms: np.ndarray, coords: np.ndarray
) -> list[tuple[int, int]]:
    """Bonds short enough to be double/triple (these never rotate)."""
    atomnos = _as_atomnos(atomnos_or_atoms)
    coords = np.asarray(coords, dtype=np.float64)
    radii = COVALENT_RADII[atomnos]
    out = []
    n = len(atomnos)
    for i in range(n):
        for j in range(i + 1, n):
            d = float(np.linalg.norm(coords[i] - coords[j]))
            if d < DOUBLE_BOND_FACTOR * (radii[i] + radii[j]):
                out.append((i, j))
    return out


def neighbors(graph: nx.Graph, i: int) -> list[int]:
    return list(graph.neighbors(i))


def element(graph: nx.Graph, i: int) -> str:
    return graph.nodes[i]["atoms"]


def get_sp_n(i: int, graph: nx.Graph) -> int | None:
    """Crude hybridization estimate from element + connectivity.

    Returns 1/2/3 (sp/sp2/sp3) or None, matching how the reference consumes
    prism_pruner.get_sp_n for torsion n-fold classification
    (firecode/torsion_module.py:110-137).
    """
    el = element(graph, i)
    d = graph.degree[i]
    if el == "C":
        return {4: 3, 3: 2, 2: 1}.get(d)
    if el in ("N", "P", "As"):
        if is_amide_n(i, graph, mode=-1):
            return 2
        return {4: 3, 3: 3, 2: 2, 1: 1}.get(d)
    if el in ("O", "S", "Se"):
        if d >= 3:
            return 3  # sulfoxide/sulfone-like
        return {2: 3, 1: 2}.get(d)
    if el == "B":
        return {4: 3, 3: 2}.get(d)
    return None


def is_sp_n(i: int, graph: nx.Graph, n: int) -> bool:
    return get_sp_n(i, graph) == n


def _carbonyl_carbons(graph: nx.Graph) -> set[int]:
    """C atoms double-bonded to a terminal O (carbonyl-like)."""
    out = set()
    for i in graph.nodes:
        if element(graph, i) == "C":
            for n in graph.neighbors(i):
                if element(graph, n) == "O" and graph.degree[n] == 1:
                    out.add(i)
                    break
    return out


def is_amide_n(i: int, graph: nx.Graph, mode: int = -1) -> bool:
    """N bonded to a carbonyl carbon.

    mode -1: any amide N; mode 1: secondary (exactly one H on N);
    mode 2: tertiary (no H on N). Mirrors the call surface used at
    firecode/torsion_module.py:116,183.
    """
    if element(graph, i) != "N":
        return False
    carbonyls = _carbonyl_carbons(graph)
    if not any(n in carbonyls for n in graph.neighbors(i)):
        return False
    n_h = sum(1 for n in graph.neighbors(i) if element(graph, n) == "H")
    if mode == 1:
        return n_h == 1
    if mode == 2:
        return n_h == 0
    return True


def is_ester_o(i: int, graph: nx.Graph) -> bool:
    """Bridging O of an ester/carboxylic acid (O bonded to carbonyl C)."""
    if element(graph, i) != "O" or graph.degree[i] != 2:
        return False
    carbonyls = _carbonyl_carbons(graph)
    return any(n in carbonyls for n in graph.neighbors(i))


def get_phenyl_ids(i: int, graph: nx.Graph) -> tuple[int, ...] | None:
    """If atom i sits on a benzene-like 6-ring, return its members in ring
    order starting at i; else None. Used for phenyl-flip symmetry detection
    (firecode/torsion_module.py:218-240).
    """
    for cycle in nx.cycle_basis(graph):
        if len(cycle) == 6 and i in cycle:
            if all(element(graph, a) == "C" and graph.degree[a] in (2, 3) for a in cycle):
                ring = nx.cycle_graph(6)  # noqa: F841  (order check below)
                sub = graph.subgraph(cycle)
                if all(sub.degree[a] == 2 for a in cycle):
                    # walk around the ring starting at i
                    order = [i]
                    prev = None
                    cur = i
                    for _ in range(5):
                        nxts = [a for a in sub.neighbors(cur) if a != prev]
                        prev, cur = cur, nxts[0]
                        order.append(cur)
                    return tuple(order)
    return None


def get_sum_graph(
    graphs: Iterable[nx.Graph], extra_edges: Sequence[tuple[int, int]] | None = None
) -> nx.Graph:
    """Disjoint union of molecular graphs plus constraint edges
    (firecode/graph_manipulations.py:117-143)."""
    graphs = list(graphs)
    out = nx.Graph()
    pos = 0
    for g in graphs:
        for node, attrs in g.nodes(data=True):
            out.add_node(node + pos, **attrs)
        for a, b in g.edges:
            out.add_edge(a + pos, b + pos)
        pos += len(g.nodes)
    if extra_edges is not None and len(extra_edges) > 0:
        for a, b in extra_edges:
            out.add_edge(int(a), int(b))
    out.graph["is_single_molecule"] = len(graphs) == 1
    return out


def fragment_ids(graph: nx.Graph, n_atoms: int) -> np.ndarray:
    """i32[N] connected-component id per atom, for compenetration kernels."""
    ids = np.zeros(n_atoms, dtype=np.int32)
    for k, comp in enumerate(nx.connected_components(graph)):
        for i in comp:
            ids[i] = k
    return ids


def rotation_mask(graph: nx.Graph, quadruplet: Sequence[int]) -> np.ndarray:
    """bool[N] mask of atoms that move when rotating about the i2-i3 bond:
    everything reachable from i4 without passing through i2-i3, excluding i3
    itself (firecode/torsion_module.py:354-382)."""
    _, i2, i3, i4 = (int(x) for x in quadruplet)
    graph.remove_edge(i2, i3)
    try:
        reachable = set(nx.shortest_path(graph, i4).keys())
    finally:
        graph.add_edge(i2, i3)
    mask = np.array([i in reachable for i in graph.nodes], dtype=bool)
    mask[i3] = False
    return mask


def molecule_check(
    atoms: np.ndarray,
    old_coords: np.ndarray,
    new_coords: np.ndarray,
    max_newbonds: int = 0,
) -> bool:
    """True if bond topology is conserved up to max_newbonds changes
    (firecode/utils.py:341-353)."""
    old = {tuple(sorted(e)) for e in graphize(atoms, old_coords).edges}
    new = {tuple(sorted(e)) for e in graphize(atoms, new_coords).edges}
    return len(old ^ new) <= max_newbonds


def scramble_check_batch(
    atoms: np.ndarray,
    coords_batch: np.ndarray,
    excluded_atoms: Iterable[int],
    mols_graphs: Iterable[nx.Graph],
    max_newbonds: int = 0,
    factor: float = BOND_FACTOR,
) -> np.ndarray:
    """Vectorized scramble_check over a conformer batch [B, N, 3] -> bool[B].

    One device call instead of B host graphize calls: batched distance-based
    bond perception, xor against the expected bond matrix, count of changed
    bonds outside the excluded-atom set (firecode/utils.py:356-400 semantics,
    SURVEY.md section 7 "never per-structure Python in the hot path").
    """
    import jax.numpy as jnp

    atomnos = _as_atomnos(atoms)
    n = len(atomnos)
    coords_batch = np.asarray(coords_batch)

    expected = np.zeros((n, n), dtype=bool)
    pos = 0
    for g in mols_graphs:
        for a, b in g.edges:
            expected[a + pos, b + pos] = expected[b + pos, a + pos] = True
        pos += len(g.nodes)

    excl = np.zeros(n, dtype=bool)
    for i in excluded_atoms:
        excl[int(i)] = True
    pair_mask = np.triu(np.ones((n, n), dtype=bool), k=1)
    pair_mask &= ~excl[:, None] & ~excl[None, :]

    radii = COVALENT_RADII[atomnos]
    cutoff = jnp.asarray(factor * (radii[:, None] + radii[None, :]))
    expected_j = jnp.asarray(expected)
    pair_mask_j = jnp.asarray(pair_mask)

    # chunk the batch so the [chunk, N, N] distance tensor stays bounded
    chunk = max(1, (1 << 24) // max(n * n, 1))
    out = np.empty(len(coords_batch), dtype=bool)
    for s in range(0, len(coords_batch), chunk):
        cb = jnp.asarray(coords_batch[s : s + chunk])
        diff = cb[:, :, None, :] - cb[:, None, :, :]
        dists = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
        delta = (dists < cutoff) ^ expected_j
        counts = jnp.sum(delta & pair_mask_j, axis=(1, 2))
        out[s : s + chunk] = np.asarray(counts <= max_newbonds)
    return out


def scramble_check(
    atoms: np.ndarray,
    coords: np.ndarray,
    excluded_atoms: Iterable[int],
    mols_graphs: Iterable[nx.Graph],
    max_newbonds: int = 0,
) -> bool:
    """Multi-molecule bond-topology check ignoring constrained atoms
    (firecode/utils.py:356-400)."""
    expected = set()
    pos = 0
    for g in mols_graphs:
        for a, b in g.edges:
            expected.add(tuple(sorted((a + pos, b + pos))))
        pos += len(g.nodes)
    observed = {tuple(sorted(e)) for e in graphize(atoms, coords).edges}
    delta = expected ^ observed
    excluded = set(excluded_atoms)
    delta = {bond for bond in delta if not (bond[0] in excluded or bond[1] in excluded)}
    return len(delta) <= max_newbonds


def molecule_check_batch(
    atoms: np.ndarray,
    coords_before: np.ndarray,
    coords_after: np.ndarray,
    max_newbonds: int = 0,
    factor: float = BOND_FACTOR,
) -> np.ndarray:
    """Batched molecule_check (firecode/utils.py:341-355): compare each
    conformer's bond matrix BEFORE vs AFTER an operation, [B, N, 3] x2 ->
    bool[B]. One device call: batched distance-based bond perception on both
    batches, xor, upper-triangle count against max_newbonds."""
    import jax.numpy as jnp

    atomnos = _as_atomnos(atoms)
    n = len(atomnos)
    before = np.asarray(coords_before).reshape(-1, n, 3)
    after = np.asarray(coords_after).reshape(-1, n, 3)
    if len(before) == 1 and len(after) > 1:
        before = np.broadcast_to(before, after.shape)

    radii = COVALENT_RADII[atomnos]
    cutoff = jnp.asarray(factor * (radii[:, None] + radii[None, :]))
    triu = jnp.asarray(np.triu(np.ones((n, n), dtype=bool), k=1))

    chunk = max(1, (1 << 24) // max(n * n, 1))
    out = np.empty(len(after), dtype=bool)
    for s in range(0, len(after), chunk):
        b = jnp.asarray(before[s : s + chunk])
        a = jnp.asarray(after[s : s + chunk])

        def bonds(c):
            diff = c[:, :, None, :] - c[:, None, :, :]
            return jnp.sqrt(jnp.sum(diff * diff, axis=-1)) < cutoff

        delta = (bonds(b) ^ bonds(a)) & triu
        out[s : s + chunk] = np.asarray(jnp.sum(delta, axis=(1, 2)) <= max_newbonds)
    return out
