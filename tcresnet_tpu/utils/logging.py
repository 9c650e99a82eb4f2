"""Structured, optionally colored logging.

Reference parity: common/utils.py:69-91,142-167 (colored python logging).
"""

from __future__ import annotations

import logging
import os
import sys

_FORMAT = "%(asctime)s %(levelname).1s %(name)s] %(message)s"
_DATEFMT = "%H:%M:%S"

_COLORS = {
    logging.DEBUG: "\x1b[37m",
    logging.INFO: "\x1b[0m",
    logging.WARNING: "\x1b[33m",
    logging.ERROR: "\x1b[31m",
}
_RESET = "\x1b[0m"


class _ColorFormatter(logging.Formatter):
    def format(self, record):
        msg = super().format(record)
        color = _COLORS.get(record.levelno, "")
        return f"{color}{msg}{_RESET}" if color else msg


def get_logger(name: str, level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(f"tcresnet_tpu.{name}")
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stderr)
        use_color = sys.stderr.isatty() and os.environ.get("NO_COLOR") is None
        fmt = _ColorFormatter if use_color else logging.Formatter
        handler.setFormatter(fmt(_FORMAT, datefmt=_DATEFMT))
        logger.addHandler(handler)
        logger.setLevel(level)
        logger.propagate = False
    return logger
