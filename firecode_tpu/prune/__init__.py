from firecode_tpu.prune.cascade import (
    prune_by_moi,
    prune_by_rmsd,
    prune_by_rmsd_rot_corr,
    prune_by_tfd,
)

__all__ = ["prune_by_moi", "prune_by_rmsd", "prune_by_rmsd_rot_corr", "prune_by_tfd"]
