"""Logging (reference: common/logging/ spdlog wrapper [U]) — here a thin
stdlib-logging wrapper with a per-host prefix for multi-host runs."""

import logging
import os


def initialize_logger(level: str = "INFO") -> logging.Logger:
    host = os.environ.get("JAX_PROCESS_INDEX", "")
    prefix = f"[host {host}] " if host else ""
    logger = logging.getLogger("claragenomicsanalysis_tpu")
    if not logger.handlers:
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter(
            f"%(asctime)s {prefix}%(levelname)s %(name)s: %(message)s"))
        logger.addHandler(h)
    logger.setLevel(getattr(logging, level.upper()))
    return logger


def get_logger(name: str = "") -> logging.Logger:
    base = "claragenomicsanalysis_tpu"
    return logging.getLogger(f"{base}.{name}" if name else base)
