import numpy as np
import jax.numpy as jnp

from firecode_tpu.ops.algebra import (
    align_vec_pair,
    dihedral,
    normalize,
    point_angle,
    rot_mat_from_pointer,
    rotation_matrix_from_vectors,
    vec_angle,
)
from firecode_tpu.prune.oracle import np_dihedral


def test_normalize(rng):
    v = rng.normal(size=(10, 3))
    out = np.asarray(normalize(jnp.asarray(v)))
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-9)


def test_vec_angle():
    assert np.isclose(float(vec_angle(jnp.array([1.0, 0, 0]), jnp.array([0, 1.0, 0]))), 90.0)
    assert np.isclose(float(vec_angle(jnp.array([1.0, 0, 0]), jnp.array([1.0, 0, 0]))), 0.0)
    assert np.isclose(float(vec_angle(jnp.array([1.0, 0, 0]), jnp.array([-2.0, 0, 0]))), 180.0)


def test_point_angle():
    p1 = jnp.array([1.0, 0.0, 0.0])
    p2 = jnp.array([0.0, 0.0, 0.0])
    p3 = jnp.array([0.0, 1.0, 0.0])
    assert np.isclose(float(point_angle(p1, p2, p3)), 90.0)


def test_dihedral_matches_oracle(rng):
    pts = rng.normal(size=(50, 4, 3)) * 2.0
    got = np.asarray(dihedral(jnp.asarray(pts)))
    want = np.array([np_dihedral(p) for p in pts])
    np.testing.assert_allclose(got, want, atol=1e-8)


def test_rot_mat_from_pointer_properties(rng):
    axis = rng.normal(size=3)
    r = np.asarray(rot_mat_from_pointer(jnp.asarray(axis), 73.0))
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-10)
    assert np.isclose(np.linalg.det(r), 1.0)
    # axis is invariant
    np.testing.assert_allclose(r @ (axis / np.linalg.norm(axis)), axis / np.linalg.norm(axis), atol=1e-10)
    # rotation angle is correct
    trace = np.trace(r)
    angle = np.degrees(np.arccos((trace - 1) / 2))
    assert np.isclose(angle, 73.0, atol=1e-6)


def test_rotation_matrix_from_vectors(rng):
    for _ in range(20):
        v1 = rng.normal(size=3)
        v2 = rng.normal(size=3)
        r = np.asarray(rotation_matrix_from_vectors(jnp.asarray(v1), jnp.asarray(v2)))
        out = r @ (v1 / np.linalg.norm(v1))
        np.testing.assert_allclose(out, v2 / np.linalg.norm(v2), atol=1e-8)
    # parallel
    r = np.asarray(rotation_matrix_from_vectors(jnp.array([1.0, 0, 0]), jnp.array([2.0, 0, 0])))
    np.testing.assert_allclose(r, np.eye(3), atol=1e-8)
    # antiparallel
    r = np.asarray(rotation_matrix_from_vectors(jnp.array([1.0, 0, 0]), jnp.array([-1.0, 0, 0])))
    np.testing.assert_allclose(r @ np.array([1.0, 0, 0]), [-1.0, 0, 0], atol=1e-8)
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-10)


def test_align_vec_pair(rng):
    # rotate a known pair by a random rotation; align_vec_pair must recover it
    from scipy.spatial.transform import Rotation

    ref = rng.normal(size=(2, 3))
    rot_true = Rotation.random(random_state=7).as_matrix()
    tgt = ref @ rot_true  # tgt_j = rot_true.T @ ref_j
    r = np.asarray(align_vec_pair(jnp.asarray(ref), jnp.asarray(tgt)))
    aligned = tgt @ r.T
    np.testing.assert_allclose(aligned, ref, atol=1e-8)
