from lightpycl_tpu.tracer.config import TraceConfig
from lightpycl_tpu.tracer.scene import Scene, build_scene
from lightpycl_tpu.tracer.rays import RayBatch, DetectorState, Ledger
from lightpycl_tpu.tracer.engine import Tracer, TraceResult

__all__ = [
    "TraceConfig",
    "Scene",
    "build_scene",
    "RayBatch",
    "DetectorState",
    "Ledger",
    "Tracer",
    "TraceResult",
]
