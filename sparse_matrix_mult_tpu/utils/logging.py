"""Structured logging (replaces the reference's raw stdout prints,
``/root/reference/sparse_matrix_mult/matrix_ops.py:89-90,133,370-383``)."""

from __future__ import annotations

import logging
import os

_LOGGER_NAME = "sparse_matrix_mult_tpu"


def get_logger() -> logging.Logger:
    logger = logging.getLogger(_LOGGER_NAME)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(
            logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s")
        )
        logger.addHandler(handler)
        level = os.environ.get("SMM_TPU_LOG", "WARNING").upper()
        logger.setLevel(getattr(logging, level, logging.WARNING))
    return logger
