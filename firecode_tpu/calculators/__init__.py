from firecode_tpu.calculators.base import Calculator
from firecode_tpu.calculators.forcefield import LiteFF, build_ff_topology
from firecode_tpu.calculators.reactive_ff import ReactiveFF

__all__ = ["Calculator", "LiteFF", "ReactiveFF", "build_ff_topology"]
