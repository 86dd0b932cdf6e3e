"""firecode_tpu — a TPU-native computational-chemistry framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of ntampellini/FIRECODE
(conformational-ensemble generation, similarity pruning, constrained batched
optimization, transition-state search, and quasi-RRHO thermochemistry), designed
for TPU hardware: ensembles are HBM-resident batched arrays, hot kernels are
vmapped/tiled on device, and multi-chip scaling rides `jax.sharding` meshes.

Reference capability map: see PARITY.md; structural analysis of the CPU
reference: SURVEY.md.
"""

__version__ = "0.1.0"

from firecode_tpu.ensemble import Ensemble
from firecode_tpu.pt import pt


def __getattr__(name):
    # lazy top-level API: keep `import firecode_tpu` light (no jax import)
    if name == "csearch":
        from firecode_tpu.csearch import csearch

        return csearch
    if name in ("prune_by_rmsd", "prune_by_moi", "prune_by_rmsd_rot_corr", "prune_by_tfd"):
        import firecode_tpu.prune as prune

        return getattr(prune, name)
    if name == "optimize_batch":
        from firecode_tpu.opt import optimize_batch

        return optimize_batch
    if name in ("LiteFF", "ReactiveFF"):
        import firecode_tpu.calculators as calculators

        return getattr(calculators, name)
    if name == "GFNFF":
        from firecode_tpu.calculators.gfnff import GFNFF

        return GFNFF
    if name == "StackedLiteFF":
        from firecode_tpu.calculators.forcefield import StackedLiteFF

        return StackedLiteFF
    if name == "run_mtd":
        from firecode_tpu.md.metadynamics import run_mtd

        return run_mtd
    if name == "run_goat":
        from firecode_tpu.md.goat import run_goat

        return run_goat
    if name == "run_gc":
        from firecode_tpu.md.gc import run_gc

        return run_gc
    if name == "Embedder":
        from firecode_tpu.driver import Embedder

        return Embedder
    if name == "Hypermolecule":
        from firecode_tpu.embed import Hypermolecule

        return Hypermolecule
    if name in ("ensemble_analysis", "boltzmann_populations"):
        import firecode_tpu.ensemble_thermo as _et

        return getattr(_et, name)
    raise AttributeError(f"module 'firecode_tpu' has no attribute {name!r}")


__all__ = [
    "Ensemble",
    "pt",
    "csearch",
    "prune_by_rmsd",
    "prune_by_moi",
    "prune_by_rmsd_rot_corr",
    "prune_by_tfd",
    "optimize_batch",
    "LiteFF",
    "ReactiveFF",
    "GFNFF",
    "StackedLiteFF",
    "run_mtd",
    "run_goat",
    "run_gc",
    "Embedder",
    "Hypermolecule",
    "ensemble_analysis",
    "boltzmann_populations",
    "__version__",
]
