"""Logging setup.

Reference parity: the reference reports progress with bare print()
(device chosen, iteration progress, ray counts, timing — SURVEY.md §5.5);
here the same information is emitted through the stdlib logging module at
INFO level under the "lightpycl_tpu" logger.
"""

from __future__ import annotations

import logging


def setup_logging(level=logging.INFO):
    logger = logging.getLogger("lightpycl_tpu")
    if not logger.handlers:
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter("[%(asctime)s %(name)s] %(message)s", "%H:%M:%S"))
        logger.addHandler(h)
    logger.setLevel(level)
    return logger
