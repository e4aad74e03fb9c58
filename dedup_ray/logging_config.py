"""S15 — file + console log sink.

Analogue of the reference's ``setup_logger``
(``/root/reference/dedup/logging_config.py:5-36``): one named logger with a
``dedup.log`` file handler and a stdout console handler sharing a
timestamped formatter, ``propagate`` disabled so nothing double-prints
through the root logger.  The engine's run-level progress (per-sink row
counts, summary) is logged through this; per-stage wall/rows metrics live in
the checkpoint manifest (``state/checkpoint.py``) instead of the log file.
"""

from __future__ import annotations

import logging
import sys

FORMAT = "%(asctime)s - %(levelname)s - %(message)s"


def setup_logger(
    name: str = "dedup_ray",
    log_file: str | None = "dedup.log",
    verbosity: int | str = logging.INFO,
) -> logging.Logger:
    """Configure and return the engine logger.

    Idempotent: re-running (e.g. in tests, or under ``ray job submit`` where
    the driver may call main() twice) replaces this module's handlers instead
    of stacking duplicates.
    """
    logger = logging.getLogger(name)
    logger.setLevel(verbosity)
    formatter = logging.Formatter(FORMAT)

    for h in list(logger.handlers):
        if getattr(h, "_dedup_ray_handler", False):
            logger.removeHandler(h)
            h.close()

    console = logging.StreamHandler(sys.stdout)
    console.setLevel(verbosity)
    console.setFormatter(formatter)
    console._dedup_ray_handler = True
    logger.addHandler(console)

    if log_file:
        fh = logging.FileHandler(log_file)
        fh.setLevel(verbosity)
        fh.setFormatter(formatter)
        fh._dedup_ray_handler = True
        logger.addHandler(fh)

    logger.propagate = False
    return logger
