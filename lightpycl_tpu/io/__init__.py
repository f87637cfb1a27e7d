from lightpycl_tpu.io.dxf import DXFWriter, save_traced_scene

__all__ = ["DXFWriter", "save_traced_scene"]
