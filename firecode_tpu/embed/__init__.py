from firecode_tpu.embed.hypermolecule import Hypermolecule, Pivot
from firecode_tpu.embed.orbitals import ReactiveAtom, build_reactive_atom

__all__ = ["Hypermolecule", "Pivot", "ReactiveAtom", "build_reactive_atom"]
