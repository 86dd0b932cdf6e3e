from firecode_tpu.opt.constraints import Constraints
from firecode_tpu.opt.fire import OptResult, optimize_batch

__all__ = ["Constraints", "OptResult", "optimize_batch"]
