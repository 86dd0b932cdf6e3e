from firecode_tpu.ops.algebra import (
    align_vec_pair,
    dihedral,
    norm_of,
    normalize,
    point_angle,
    rot_mat_from_pointer,
    rotation_matrix_from_vectors,
    vec_angle,
)
from firecode_tpu.ops.rmsd import (
    center_coords,
    kabsch_align,
    pairwise_rmsd,
    pairwise_rmsd_maxdev,
    rmsd_and_max,
)

__all__ = [
    "align_vec_pair",
    "center_coords",
    "dihedral",
    "kabsch_align",
    "norm_of",
    "normalize",
    "pairwise_rmsd",
    "pairwise_rmsd_maxdev",
    "point_angle",
    "rmsd_and_max",
    "rot_mat_from_pointer",
    "rotation_matrix_from_vectors",
    "vec_angle",
]
