"""Structured step/duration logging.

Reference parity: ``lib/logging_utils.py`` + the ``_log_step`` /
``_log_duration`` hooks threaded through the checker and handler
(reference lib/checker_handler.py:30-40, lib/checker.py logging
calls; durations are the only performance telemetry the reference
emits — BASELINE.md). Rebuild: stdlib logging with JSON lines and a
context-manager timer, so the engine's stages produce the same style
of evidence without a bespoke logging stack.
"""

from __future__ import annotations

import json
import logging
import time
from contextlib import contextmanager
from typing import Any

_LOGGER_NAME = "mydatalake_spark"


def get_logger() -> logging.Logger:
    logger = logging.getLogger(_LOGGER_NAME)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter("%(message)s"))
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
        logger.propagate = False
    return logger


def log_step(stage: str, message: str, **fields: Any) -> None:
    """One JSON log line (reference lib/logging_utils.py style)."""
    get_logger().info(
        json.dumps(
            {"ts": time.time(), "stage": stage, "msg": message, **fields}
        )
    )


@contextmanager
def log_duration(stage: str, **fields: Any):
    """Step timer (reference _log_duration, lib/checker_handler.py:30-40)."""
    start = time.perf_counter()
    try:
        yield
    finally:
        log_step(
            stage,
            "duration",
            duration_s=round(time.perf_counter() - start, 3),
            **fields,
        )
