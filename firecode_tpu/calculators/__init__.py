from firecode_tpu.calculators.base import Calculator
from firecode_tpu.calculators.forcefield import LiteFF, build_ff_topology

__all__ = ["Calculator", "LiteFF", "build_ff_topology"]
