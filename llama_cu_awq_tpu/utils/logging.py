"""Structured logging (SURVEY.md §5: the reference's only observability
is printf — params dump, load progress, tok/s; we keep that user-visible
surface in the CLI and add standard `logging` underneath for services).
"""

from __future__ import annotations

import logging
import time
from contextlib import contextmanager

_FORMAT = "%(asctime)s %(name)s %(levelname)s %(message)s"
_configured = False


def get_logger(name: str = "llama_tpu") -> logging.Logger:
    global _configured
    if not _configured:
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter(_FORMAT))
        root = logging.getLogger("llama_tpu")
        if not root.handlers:
            root.addHandler(handler)
        root.setLevel(logging.INFO)
        root.propagate = False
        _configured = True
    return logging.getLogger(name)


@contextmanager
def log_timing(logger: logging.Logger, what: str, level=logging.INFO):
    """Log wall time of a block: `with log_timing(log, "load weights"):`"""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        logger.log(level, "%s took %.3fs", what, time.perf_counter() - t0)
