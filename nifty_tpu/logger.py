"""Module logger (single stream handler, INFO default).

Parity: reference ``src/re/logger.py``.
"""

import logging
import sys

logger = logging.getLogger("nifty_tpu")
if not logger.handlers:
    _h = logging.StreamHandler(sys.stdout)
    _h.setFormatter(logging.Formatter("%(message)s"))
    logger.addHandler(_h)
    logger.setLevel(logging.INFO)
    logger.propagate = False
