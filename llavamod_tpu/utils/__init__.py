from llavamod_tpu.utils.logging import build_logger, rank0_print
from llavamod_tpu.utils.registry import Registry
from llavamod_tpu.utils.misc import order_pick_k
