"""Stderr logging for the framework.

Mirrors the role of the reference's logger (reference: open_pcc_metric/logger.py:5-16)
but fixes its duplicate-handler bug (SURVEY Q2): ``get_logger`` is idempotent — a
handler is attached exactly once per named logger.
"""
import logging
import sys

_FORMAT = "%(asctime)s %(levelname)s %(name)s: %(message)s"


def get_logger(name: str = "pcc_metric_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(logging.Formatter(_FORMAT))
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
        logger.propagate = False
    return logger
