from hpgmg_tpu.ops.base import OperatorSuite, get_suite
from hpgmg_tpu.ops import transfer

__all__ = ["OperatorSuite", "get_suite", "transfer"]
