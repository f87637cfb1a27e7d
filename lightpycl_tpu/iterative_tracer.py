"""Reference-named module alias (upstream: iterative_tracer.py).

    from lightpycl_tpu.iterative_tracer import CL_Tracer
"""

from lightpycl_tpu.compat import CL_Tracer
from lightpycl_tpu.tracer.config import TraceConfig
from lightpycl_tpu.tracer.engine import Tracer, TraceResult

__all__ = ["CL_Tracer", "Tracer", "TraceResult", "TraceConfig"]
