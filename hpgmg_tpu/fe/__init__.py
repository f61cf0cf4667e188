from hpgmg_tpu.fe.grid import FEGrid
from hpgmg_tpu.fe.op import FEOp, get_fe_op
from hpgmg_tpu.fe.fas import (build_fe_levels, fas_fcycle, fas_vcycle,
                              run_fmg, diagnostics)
from hpgmg_tpu.fe.sampler import run_sample

__all__ = ["FEGrid", "FEOp", "get_fe_op", "build_fe_levels", "fas_fcycle",
           "fas_vcycle", "run_fmg", "diagnostics", "run_sample"]
