from lightpycl_tpu.utils.logging_util import setup_logging
from lightpycl_tpu.utils.profiling import Timer, trace_profile

__all__ = ["setup_logging", "Timer", "trace_profile"]
