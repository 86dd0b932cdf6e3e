"""Pose generators: string / cyclical / chelotropic / multiembed.

Capability parity with the reference's embed algorithms (firecode/embeds.py:
51-826), restructured TPU-first: the reference builds one pose at a time and
immediately clash-checks it with cdist; here every (conformer x pivot x
orientation x angle) candidate of a batch is generated with vectorized host
math (the per-pose transform is tiny), and ALL candidates are screened at
once on device — fused compenetration check (firecode_tpu.ops.clash) followed
by a blockwise similarity dedup (firecode_tpu.prune). The generation grid is
identical to the reference's:

- string embed: antiparallel lobe alignment + 360-degree sweep about the
  bond axis (embeds.py:51-158);
- cyclical bimolecular: pivot digons via polygonize + 2 orientations +
  per-molecule systematic angles (embeds.py:588-750);
- cyclical trimolecular: pivot triangles, 8 orientations, circumcenter-based
  facing directions with the angular refinement pass (embeds.py:180-585);
- chelotropic: cyclical with single-atom pivots;
- multiembed: systematic screening of all bimolecular reactive-pair
  arrangements (firecode/multiembed.py:23-159) — sequential batched embeds
  instead of a process pool.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from firecode_tpu.errors import TriangleError, ZeroCandidatesError


# --------------------------------------------------------------------------
# host-side small algebra (pure numpy: single-pose transforms are scalar work;
# only the batched screening goes to device)
# --------------------------------------------------------------------------


def _np_rot_from_pointer(axis: np.ndarray, angle_deg: float) -> np.ndarray:
    theta = np.radians(angle_deg)
    a = np.asarray(axis, dtype=np.float64)
    a = a / max(np.linalg.norm(a), 1e-12)
    k = np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]])
    return np.eye(3) + np.sin(theta) * k + (1 - np.cos(theta)) * (k @ k)


def _np_align_vec_pair(ref: np.ndarray, tgt: np.ndarray) -> np.ndarray:
    """Kabsch on two vector pairs: R @ tgt_j ~ ref_j (firecode/algebra.py:28-49)."""
    b = np.einsum("ji,jk->ik", np.asarray(ref, float), np.asarray(tgt, float))
    u, s, vh = np.linalg.svd(b)
    if np.linalg.det(u @ vh) < 0:
        u[:, -1] = -u[:, -1]
    return u @ vh


def _np_rot_from_vectors(v1: np.ndarray, v2: np.ndarray) -> np.ndarray:
    a = np.asarray(v1, float) / max(np.linalg.norm(v1), 1e-12)
    b = np.asarray(v2, float) / max(np.linalg.norm(v2), 1e-12)
    v = np.cross(a, b)
    s2 = float(v @ v)
    c = float(a @ b)
    if s2 < 1e-16:
        if c > 0:
            return np.eye(3)
        # antiparallel: 180 deg about any perpendicular axis
        helper = np.array([1.0, 0, 0]) if abs(a[0]) < 0.9 else np.array([0.0, 1.0, 0])
        return _np_rot_from_pointer(np.cross(a, helper), 180.0)
    k = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
    return np.eye(3) + k + k @ k * ((1 - c) / s2)


def polygonize(lengths: np.ndarray) -> np.ndarray:
    """Vertex vector-couples for the cyclical embed polygon
    (firecode/utils.py:252-312): digons give 2 orientations, triangles 8.
    Output: [n_orient, n_mols, 2(start/end), 3].
    """
    lengths = np.asarray(lengths, dtype=np.float64)
    assert len(lengths) in (2, 3)
    arr = np.zeros((len(lengths), 2, 3))

    if len(lengths) == 2:
        arr[0, 0] = [-lengths[0] / 2, 0, 0]
        arr[0, 1] = [+lengths[0] / 2, 0, 0]
        arr[1, 0] = [-lengths[1] / 2, 0, 0]
        arr[1, 1] = [+lengths[1] / 2, 0, 0]
        out = np.stack([arr, arr.copy()])
        out[1, 1] *= -1  # second orientation: flip the second molecule
        return out

    if not all(lengths[i] < lengths[i - 1] + lengths[i - 2] for i in (0, 1, 2)):
        raise TriangleError(f"Cannot build a triangle with sides {lengths}")

    arr[0, 1] = [lengths[0], 0, 0]
    arr[1, 0] = [lengths[0], 0, 0]
    a, b, c = lengths[0] ** 2, lengths[1] ** 2, lengths[2] ** 2
    x = (a - b + c) / (2 * np.sqrt(a))
    y = np.sqrt(max(c - x**2, 0.0))
    arr[1, 1] = [x, y, 0]
    arr[2, 0] = [x, y, 0]

    out = np.stack([arr] * 8).copy()
    swaps = [
        (1, 2), (2, 1), (3, 1), (3, 2), (4, 0), (5, 0),
        (5, 1), (6, 0), (6, 2), (7, 0), (7, 1), (7, 2),
    ]
    for t, v in swaps:
        out[t, v] = out[t, v][[1, 0]]
    return out


def _triangle_directions(norms: np.ndarray) -> np.ndarray:
    """Facing directions for each triangle side (towards the circumcenter,
    sign-corrected for obtuse triangles) — firecode/embeds.py:188-254."""
    if len(norms) == 2:
        return np.array([[0.0, 1.0, 0.0], [0.0, -1.0, 0.0]])

    vertices = np.zeros((3, 2))
    vertices[1] = [norms[0], 0]
    a, b, c = norms[0] ** 2, norms[1] ** 2, norms[2] ** 2
    x = (a - b + c) / (2 * np.sqrt(a))
    y = np.sqrt(max(c - x**2, 0.0))
    vertices[2] = [x, y]

    av = vertices[1, 0]
    bv = vertices[2, 0]
    cv = vertices[2, 1]
    cc = np.array([av / 2, (bv**2 + cv**2 - av * bv) / (2 * cv)])

    v0, v1, v2 = vertices
    dirs = [cc - (v0 + v1) / 2, cc - (v1 + v2) / 2, cc - (v2 + v0) / 2]
    if any(np.allclose(d, 0) for d in dirs):
        return _triangle_directions(norms + np.array([1e-5, 0, 0]))

    def ang(p, q):
        cosv = np.clip(
            (p @ q) / (np.linalg.norm(p) * np.linalg.norm(q) + 1e-12), -1, 1
        )
        return np.degrees(np.arccos(cosv))

    obtuse = [
        ang(v1 - v0, v2 - v0) > 90,
        ang(v0 - v1, v2 - v1) > 90,
        ang(v0 - v2, v1 - v2) > 90,
    ]
    if obtuse[2]:
        dirs[0] = -dirs[0]
    if obtuse[0]:
        dirs[1] = -dirs[1]
    if obtuse[1]:
        dirs[2] = -dirs[2]
    out = np.stack([np.concatenate([d, [0.0]]) for d in dirs])
    return out / np.linalg.norm(out, axis=1, keepdims=True)


# --------------------------------------------------------------------------
# device screening
# --------------------------------------------------------------------------


def screen_poses(
    poses: np.ndarray,
    frag_ids: np.ndarray,
    clash_thr: float,
    dedup: str = "rmsd",
    dedup_thr: float = 1.0,
    quadruplets: np.ndarray | None = None,
    extra_arrays: list[np.ndarray] | None = None,
) -> tuple[np.ndarray, list[np.ndarray]]:
    """Batched clash check + similarity dedup of candidate poses on device.

    Returns surviving poses and the same-masked extra arrays.
    """
    from firecode_tpu.ops.clash import compenetration_ok
    from firecode_tpu.prune import prune_by_rmsd, prune_by_tfd

    extra_arrays = extra_arrays or []
    if len(poses) == 0:
        return poses, extra_arrays

    ok = np.asarray(
        compenetration_ok(
            jnp.asarray(poses), jnp.asarray(frag_ids), thr=clash_thr
        )
    )
    poses = poses[ok]
    extra_arrays = [a[ok] for a in extra_arrays]
    if len(poses) == 0:
        return poses, extra_arrays

    if dedup == "tfd" and quadruplets is not None and len(quadruplets):
        keep = prune_by_tfd(poses, quadruplets, thresh=10.0)
    else:
        keep = prune_by_rmsd(poses, rmsd_thr=dedup_thr)
    return poses[keep], [a[keep] for a in extra_arrays]


# --------------------------------------------------------------------------
# string embed
# --------------------------------------------------------------------------


def string_embed(embedder) -> np.ndarray:
    """Two molecules, one reactive atom each: antiparallel lobe alignment +
    rotation sweep about the bond axis."""
    assert len(embedder.objects) == 2
    mol1, mol2 = embedder.objects
    angles = embedder.systematic_angles  # flat list of angles for string
    clash_thr = embedder.options.clash_thresh

    poses = []
    for c1 in range(len(mol1.coords)):
        for c2 in range(len(mol2.coords)):
            ra1 = mol1.get_r_atoms(c1)[0]
            ra2 = mol2.get_r_atoms(c2)[0]
            for i1 in range(ra1.n_lobes):
                for i2 in range(ra2.n_lobes):
                    p1 = ra1.centers[i1]
                    p2 = ra2.centers[i2]
                    ref_vec = ra1.orb_vecs[i1]
                    mol_vec = ra2.orb_vecs[i2]
                    rot0 = _np_rot_from_vectors(mol_vec, -ref_vec)
                    for angle in angles:
                        rot = rot0
                        if angle != 0:
                            rot = _np_rot_from_pointer(ref_vec, float(angle)) @ rot0
                        pos = p1 - rot @ p2
                        pose = np.concatenate(
                            [mol1.coords[c1], mol2.coords[c2] @ rot.T + pos]
                        )
                        poses.append(pose)

    poses = np.array(poses)
    frag_ids = np.concatenate(
        [np.zeros(mol1.n_atoms, np.int32), np.ones(mol2.n_atoms, np.int32)]
    )

    # TFD dedup needs the joint graph's torsion quadruplets
    from firecode_tpu.graphs import get_sum_graph
    from firecode_tpu.torsions import get_quadruplets

    pair = (
        int(mol1.reactive_indices[0]),
        int(mol2.reactive_indices[0] + embedder.ids[0]),
    )
    sum_graph = get_sum_graph([mol1.graph, mol2.graph], [pair])
    quads = get_quadruplets(sum_graph)

    poses, _ = screen_poses(
        poses, frag_ids, clash_thr, dedup="tfd", quadruplets=quads
    )
    if len(poses) == 0:
        raise ZeroCandidatesError(
            "String embed did not find any suitable disposition of molecules. "
            "Try expanding the conformational space (csearch> operator) or see SHRINK."
        )
    embedder.constrained_indices = np.array([[pair]] * len(poses))
    return poses


# --------------------------------------------------------------------------
# cyclical embed (bi- and trimolecular) + chelotropic
# --------------------------------------------------------------------------


def _mol_transform(mol, conf_id, pivot, vec_pair, direction, angle):
    """Rotation+position placing one molecule so its pivot matches vec_pair,
    facing `direction`, step-rotated by `angle` about its reactive axis.
    Mirrors firecode/embeds.py:649-711."""
    start, end = vec_pair
    reactive_coords = mol.coords[conf_id][mol.reactive_indices]
    atomic_pivot_mean = reactive_coords.mean(axis=0)

    mol_direction = pivot.meanpoint - atomic_pivot_mean
    if np.all(mol_direction == 0.0):
        mol_direction = pivot.meanpoint

    align = _np_align_vec_pair(
        np.array([end - start, direction]), np.array([pivot.pivot, mol_direction])
    )
    if len(reactive_coords) == 2:
        axis = align @ (reactive_coords[0] - reactive_coords[1])
    else:
        axis = align @ pivot.pivot
    step = _np_rot_from_pointer(axis, float(angle))
    center = align @ atomic_pivot_mean

    rotation = step @ align
    pos = (vec_pair[0] + vec_pair[1]) / 2 - align @ pivot.meanpoint
    position = center - step @ center + pos
    return rotation, position


def _cyclical_reactive_indices(embedder, pivots, orientation) -> list[tuple[int, int]]:
    """Atom pairs facing each other for this polygon orientation
    (firecode/embeds.py:753-784)."""
    cum = [[p.start_atom.cumnum, p.end_atom.cumnum] for p in pivots]

    if len(embedder.objects) == 2:
        swaps = [(0, 0), (0, 1)]
        oriented = [
            list(reversed(ids)) if swaps[orientation][i] else ids
            for i, ids in enumerate(cum)
        ]
        return [
            (oriented[0][0], oriented[1][0]),
            (oriented[0][1], oriented[1][1]),
        ]

    swaps3 = [
        (0, 0, 0), (0, 0, 1), (0, 1, 0), (0, 1, 1),
        (1, 0, 0), (1, 1, 0), (1, 0, 1), (1, 1, 1),
    ]
    oriented = [
        list(reversed(ids)) if swaps3[orientation][i] else ids
        for i, ids in enumerate(cum)
    ]
    couples = [
        (oriented[0][1], oriented[1][0]),
        (oriented[1][1], oriented[2][0]),
        (oriented[2][1], oriented[0][0]),
    ]
    return [tuple(sorted(c)) for c in couples]


def _pairings_satisfied(embedder, ids) -> bool:
    if not embedder.pairings_table:
        return True
    internal = {tuple(sorted(p)) for p in np.asarray(embedder.internal_constraints).reshape(-1, 2)}
    return all(
        tuple(sorted(pair)) in {tuple(sorted(i)) for i in ids} or tuple(sorted(pair)) in internal
        for pair in embedder.pairings_table.values()
    )


def _adjust_directions_trimol(embedder, directions, ids, vecs, pivots, conf_ids, norms):
    """Trimolecular pre-alignment refinement (firecode/embeds.py:256-407):
    systematically rotate each molecule about its pivot and keep the angle
    combo minimizing deviation from collinear orbital interactions."""
    p_vecs = [end - start for start, end in vecs]
    p_means = [(end + start) / 2 for start, end in vecs]

    vertices = np.zeros((3, 3))
    vertices[1, 0] = norms[0]
    a, b, c = norms[0] ** 2, norms[1] ** 2, norms[2] ** 2
    x = (a - b + c) / (2 * np.sqrt(a))
    vertices[2, :2] = [x, np.sqrt(max(c - x**2, 0.0))]
    v0, v1, v2 = vertices

    # place the three molecules with the current directions
    placed = []
    for i in range(3):
        mol = embedder.objects[i]
        rot, pos = _mol_transform(
            mol, conf_ids[i], pivots[i], vecs[i], directions[i], 0.0
        )
        placed.append((rot, pos))

    # reactive-atom positions facing each partner
    r = np.zeros((3, 3), dtype=int)
    for (m1, i1), (m2, i2) in _pairings_as_mol_index(embedder, ids):
        r[m1, m2] = i1
        r[m2, m1] = i2

    def placed_atom(m, idx):
        rot, pos = placed[m]
        return rot @ embedder.objects[m].coords[conf_ids[m]][idx] + pos

    a01 = placed_atom(0, r[0, 1])
    a02 = placed_atom(0, r[0, 2])
    a10 = placed_atom(1, r[1, 0])
    a12 = placed_atom(1, r[1, 2])
    a20 = placed_atom(2, r[2, 0])
    a21 = placed_atom(2, r[2, 1])

    steps, angle_range = 6, 30.0
    grid = np.arange(steps + 1) * (2 * angle_range / steps) - angle_range
    best_cost, best_dirs = np.inf, directions

    def ang(p, q):
        cosv = np.clip(
            (p @ q) / (np.linalg.norm(p) * np.linalg.norm(q) + 1e-12), -1, 1
        )
        return np.degrees(np.arccos(cosv))

    for ang0 in grid:
        rot0 = _np_rot_from_pointer(p_vecs[0], float(ang0))
        na01, na02 = rot0 @ a01, rot0 @ a02
        d0 = p_means[0] - (na01 + na02) / 2
        for ang1 in grid:
            rot1 = _np_rot_from_pointer(p_vecs[1], float(ang1))
            na10, na12 = rot1 @ a10, rot1 @ a12
            d1 = p_means[1] - (na10 + na12) / 2
            for ang2 in grid:
                rot2 = _np_rot_from_pointer(p_vecs[2], float(ang2))
                na20, na21 = rot2 @ a20, rot2 @ a21
                d2 = p_means[2] - (na20 + na21) / 2
                cost = (
                    ang(v0 - na02, na20 - v0)
                    + ang(v1 - na01, na10 - v1)
                    + ang(v2 - na21, na12 - v2)
                )
                if cost < best_cost:
                    best_cost = cost
                    best_dirs = np.array([d0, d1, d2])
    return best_dirs


def _pairings_as_mol_index(embedder, ids):
    """Convert cumulative-index pairs to ((mol, local_idx), (mol, local_idx))."""
    offsets = np.concatenate([[0], np.cumsum(embedder.ids)])
    out = []
    for c1, c2 in ids:
        m1 = int(np.searchsorted(offsets, c1, side="right")) - 1
        m2 = int(np.searchsorted(offsets, c2, side="right")) - 1
        out.append(((m1, int(c1 - offsets[m1])), (m2, int(c2 - offsets[m2]))))
    return out


def cyclical_embed(embedder, max_norm_delta: float = 10.0) -> np.ndarray:
    """Cyclical/chelotropic embed for 2 or 3 molecules."""
    n_mols = len(embedder.objects)
    assert n_mols in (2, 3)
    clash_thr = embedder.options.clash_thresh

    conf_counts = [len(mol.coords) for mol in embedder.objects]
    conf_grid = np.stack(
        np.meshgrid(*[np.arange(n) for n in conf_counts], indexing="ij"), -1
    ).reshape(-1, n_mols)

    poses: list[np.ndarray] = []
    constrained: list[list[tuple[int, int]]] = []

    for conf_ids in conf_grid:
        pivot_lists = [
            embedder.objects[m].pivots[int(conf_ids[m])] for m in range(n_mols)
        ]
        if any(len(p) == 0 for p in pivot_lists):
            continue
        pivot_grid = np.stack(
            np.meshgrid(*[np.arange(len(p)) for p in pivot_lists], indexing="ij"), -1
        ).reshape(-1, n_mols)

        for pivot_ids in pivot_grid:
            pivots = [pivot_lists[m][int(pivot_ids[m])] for m in range(n_mols)]
            norms = np.array([p.norm for p in pivots])

            if n_mols == 2:
                if abs(norms[0] - norms[1]) > max_norm_delta:
                    continue
                try:
                    polygon = polygonize(norms)
                except TriangleError:
                    continue
                directions_base = np.array([[0.0, 1.0, 0.0], [0.0, -1.0, 0.0]])
            else:
                if not all(
                    norms[i] < norms[i - 1] + norms[i - 2] for i in (0, 1, 2)
                ):
                    continue
                polygon = polygonize(norms)
                directions_base = _triangle_directions(norms)

            for v, vecs in enumerate(polygon):
                ids = _cyclical_reactive_indices(embedder, pivots, v)
                if not _pairings_satisfied(embedder, ids):
                    continue

                directions = directions_base
                if n_mols == 3:
                    directions = _adjust_directions_trimol(
                        embedder, directions, ids, vecs, pivots, conf_ids, norms
                    )

                for angles in embedder.systematic_angles:
                    angles = np.atleast_1d(np.asarray(angles, dtype=np.float64))
                    frames = []
                    for m in range(n_mols):
                        rot, pos = _mol_transform(
                            embedder.objects[m],
                            int(conf_ids[m]),
                            pivots[m],
                            vecs[m],
                            directions[m],
                            float(angles[m]),
                        )
                        frames.append(
                            embedder.objects[m].coords[int(conf_ids[m])] @ rot.T + pos
                        )
                    poses.append(np.concatenate(frames))
                    constrained.append(ids)

    if not poses:
        raise ZeroCandidatesError(
            "Cyclical embed did not find any suitable disposition of molecules."
        )

    poses_arr = np.array(poses)
    constrained_arr = np.array(constrained)
    frag_ids = np.concatenate(
        [
            np.full(mol.n_atoms, m, np.int32)
            for m, mol in enumerate(embedder.objects)
        ]
    )
    poses_arr, (constrained_arr,) = screen_poses(
        poses_arr,
        frag_ids,
        clash_thr,
        dedup="rmsd",
        dedup_thr=1.0,
        extra_arrays=[constrained_arr],
    )
    if len(poses_arr) == 0:
        raise ZeroCandidatesError(
            "Cyclical embed found no clash-free dispositions of molecules. "
            "One molecule may have distant reactive centers preventing a closed "
            "cyclical structure."
        )
    embedder.constrained_indices = constrained_arr
    return poses_arr


def monomolecular_embed(embedder) -> np.ndarray:
    """Deprecated in the reference (firecode/embeds.py:787-792)."""
    raise NotImplementedError("Monomolecular (bending) embed is deprecated.")


def multiembed_dispatcher(embedder) -> np.ndarray:
    """Bimolecular systematic screening over all reactive-pair arrangements
    (firecode/multiembed.py:23-159): each arrangement becomes a cyclical
    embed with 2 reactive atoms per molecule; results are concatenated."""
    mol1, mol2 = embedder.objects
    import copy
    from itertools import combinations
    from types import SimpleNamespace

    pairs1 = list(combinations([int(i) for i in mol1.reactive_indices], 2))
    pairs2 = list(combinations([int(i) for i in mol2.reactive_indices], 2))

    all_poses = []
    all_constr = []
    n_arr = 0
    for p1 in pairs1:
        for p2 in pairs2:
            n_arr += 1
            sub_objects = []
            for mol, rp in ((mol1, p1), (mol2, p2)):
                m = copy.copy(mol)
                m.reactive_indices = np.array(rp)
                m.reactive_atoms = {}
                m.pivots = {}
                m.sigmatropic = {}
                m.compute_orbitals()
                m.set_pivots(suprafacial=embedder.options.suprafacial)
                sub_objects.append(m)
            offset = 0
            for m in sub_objects:
                m.set_cumnums(offset)
                offset += m.n_atoms
            # lightweight embed context: exactly what cyclical_embed consumes
            sub = SimpleNamespace(
                objects=sub_objects,
                ids=np.array([m.n_atoms for m in sub_objects]),
                options=embedder.options,
                systematic_angles=embedder.systematic_angles,
                pairings_table=embedder.pairings_table,
                internal_constraints=embedder.internal_constraints,
                log=embedder.log,
                constrained_indices=None,
            )
            try:
                poses = cyclical_embed(sub)
                all_poses.append(poses)
                all_constr.append(sub.constrained_indices)
            except ZeroCandidatesError:
                continue

    if not all_poses:
        raise ZeroCandidatesError(
            f"Multiembed: none of the {n_arr} arrangements produced valid poses."
        )
    embedder.constrained_indices = np.concatenate(all_constr)
    if embedder.log:
        embedder.log(
            f"--> Multiembed: {sum(len(p) for p in all_poses)} poses from "
            f"{n_arr} arrangements"
        )
    return np.concatenate(all_poses)
