"""Run logging: console/file handlers + the ``@log`` call decorator —
the engine's rebuild of the reference logger (ingestion/utils/
logger.py:26-104 handlers, :107-165 decorator).

Differences from the reference (deliberate, SURVEY.md §4.3):

* the reference's ``except FileNotFoundError or IsADirectoryError``
  (logger.py:66) catches only the first class — here both are caught;
* S3 StringIO flush is generalized to a buffer handler that any sink
  (local file, object store client) can drain on failure;
* failures re-raise after logging — the reference swallows them and
  continues to the catalog insert (dataIngestion.py:21-37), leaving
  failed runs looking started.
"""

from __future__ import annotations

import functools
import io
import logging
import time
from collections.abc import Callable
from typing import Any

_FMT = "%(asctime)s %(levelname)s %(name)s: %(message)s"


def get_logger(
    name: str = "aws_datalake_framework_ingestion_spark",
    log_file: str | None = None,
    level: int = logging.INFO,
) -> logging.Logger:
    """Console logger, optionally tee'd to a file (reference console/
    file handlers, logger.py:52-79)."""
    logger = logging.getLogger(name)
    logger.setLevel(level)
    if not any(isinstance(h, logging.StreamHandler) for h in logger.handlers):
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter(_FMT))
        logger.addHandler(h)
    if log_file:
        try:
            fh = logging.FileHandler(log_file)
            fh.setFormatter(logging.Formatter(_FMT))
            logger.addHandler(fh)
        except (FileNotFoundError, IsADirectoryError) as e:  # both, not just one
            logger.warning("file handler unavailable (%s); console only", e)
    return logger


def buffer_handler(logger: logging.Logger) -> io.StringIO:
    """In-memory buffer handler — the reference's S3 StringIO pattern
    (logger.py:60-79): accumulate, then drain to durable storage on
    failure via ``buf.getvalue()``."""
    buf = io.StringIO()
    h = logging.StreamHandler(buf)
    h.setFormatter(logging.Formatter(_FMT))
    logger.addHandler(h)
    return buf


def log(fn: Callable[..., Any]) -> Callable[..., Any]:
    """Decorator logging call signature, duration, and errors
    (reference ``@log``, logger.py:107-165) — errors re-raise."""

    @functools.wraps(fn)
    def wrapper(*args: Any, **kwargs: Any) -> Any:
        logger = get_logger()
        sig = ", ".join(
            [*(repr(a)[:80] for a in args), *(f"{k}={v!r}"[:80] for k, v in kwargs.items())]
        )
        t0 = time.perf_counter()
        try:
            out = fn(*args, **kwargs)
        except Exception:
            logger.exception("%s(%s) failed", fn.__qualname__, sig)
            raise
        logger.info("%s(%s) ok in %.3fs", fn.__qualname__, sig, time.perf_counter() - t0)
        return out

    return wrapper
