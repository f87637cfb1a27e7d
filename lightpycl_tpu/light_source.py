"""Reference-named module alias (upstream: light_source.py).

    from lightpycl_tpu.light_source import light_source
"""

from lightpycl_tpu.sources import (
    CollimatedSource,
    LightSource,
    lambertian,
    light_source,
)

__all__ = ["light_source", "LightSource", "CollimatedSource", "lambertian"]
