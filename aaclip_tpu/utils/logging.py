"""Logger setup that always writes to the run's log file, regardless of any
pre-existing root-logger configuration (unlike logging.basicConfig)."""

from __future__ import annotations

import logging
import os


def setup_logger(name: str, log_path: str, also_stderr: bool = False) -> logging.Logger:
    os.makedirs(os.path.dirname(os.path.abspath(log_path)), exist_ok=True)
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.propagate = False
    # reset handlers so repeated main() calls (tests) don't duplicate lines
    for h in list(logger.handlers):
        logger.removeHandler(h)
        h.close()
    fh = logging.FileHandler(log_path, encoding="utf-8")
    fh.setFormatter(logging.Formatter("INFO:%(name)s:%(message)s"))
    logger.addHandler(fh)
    if also_stderr:
        sh = logging.StreamHandler()
        sh.setFormatter(logging.Formatter("%(message)s"))
        logger.addHandler(sh)
    return logger
