from lightpycl_tpu.ops.intersect_pallas import intersect_pallas, pallas_available

__all__ = ["intersect_pallas", "pallas_available"]
