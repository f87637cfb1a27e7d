from lightpycl_tpu.geometry.mesh import GeoObject
from lightpycl_tpu.geometry.primitives import OpticalElements, optical_elements

__all__ = ["GeoObject", "OpticalElements", "optical_elements"]
