from firecode_tpu.opt.constraints import Constraints
from firecode_tpu.opt.fire import OptResult, optimize_batch
from firecode_tpu.opt.neb import run_neb, run_neb_batch
from firecode_tpu.opt.saddle import saddle_refine, saddle_refine_batch

__all__ = [
    "Constraints",
    "OptResult",
    "optimize_batch",
    "run_neb",
    "run_neb_batch",
    "saddle_refine",
    "saddle_refine_batch",
]
