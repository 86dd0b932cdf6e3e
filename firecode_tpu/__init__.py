"""firecode_tpu — a TPU-native computational-chemistry framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of ntampellini/FIRECODE
(conformational-ensemble generation, similarity pruning, constrained batched
optimization, transition-state search, and quasi-RRHO thermochemistry), designed
for TPU hardware: ensembles are HBM-resident batched arrays, hot kernels are
vmapped/tiled on device, and multi-chip scaling rides `jax.sharding` meshes.

Reference capability map: see /root/repo/SURVEY.md (structural analysis of the
CPU reference implementation).
"""

__version__ = "0.1.0"

from firecode_tpu.ensemble import Ensemble
from firecode_tpu.pt import pt

__all__ = ["Ensemble", "pt", "__version__"]
