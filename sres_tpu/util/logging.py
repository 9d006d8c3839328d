"""Singleton log manager (reference: sres/base/util/logging.py).

Writes per-run log files under ``{platform.cache}/logs/{cid}.log`` with
optional console mirroring; provides the ``@exception_handled`` and
``@log_timing`` decorators used throughout the reference API surface.
"""
from __future__ import annotations

import logging
import os
import sys
import time
import traceback
from datetime import datetime
from functools import wraps
from typing import Optional


def lgm() -> "LogManager":
    return LogManager.instance()


def exception_handled(func):
    @wraps(func)
    def wrapper(*args, **kwargs):
        try:
            return func(*args, **kwargs)
        except Exception:
            lgm().exception(f" Error in {func}:")
            traceback.print_exc()
    return wrapper


def log_timing(f):
    @wraps(f)
    def wrap(*args, **kw):
        ts = time.time()
        result = f(*args, **kw)
        lgm().log(f"EXEC {f.__name__} took: {time.time() - ts:3.4f} sec")
        return result
    return wrap


class LogManager:
    _instance: Optional["LogManager"] = None

    def __init__(self):
        self._level = logging.INFO
        self._log_stream = None
        self.log_dir: Optional[str] = None
        self.log_file: Optional[str] = None

    @classmethod
    def instance(cls) -> "LogManager":
        if cls._instance is None:
            mgr = LogManager()
            mgr.init_logging()
            cls._instance = mgr
        return cls._instance

    @classmethod
    def reset(cls) -> None:
        if cls._instance is not None:
            cls._instance.close()
        cls._instance = None

    def init_logging(self) -> None:
        from sres_tpu.config import ConfigContext, cfg, cid
        if ConfigContext.cfg is not None:
            self.log_dir = f"{cfg().platform.cache}/logs"
            overwrite = cfg().task.get("overwrite_log", True)
            lid = "" if overwrite else f"-{os.getpid()}"
            self.log_file = f"{self.log_dir}/{cid()}{lid}.log"
            os.makedirs(os.path.dirname(self.log_file), exist_ok=True)
            self._log_stream = open(self.log_file, "w")

    def close(self) -> None:
        if self._log_stream is not None:
            self._log_stream.flush()
            self._log_stream.close()
            self._log_stream = None

    def set_level(self, level) -> None:
        self._level = level

    @property
    def ctime(self) -> str:
        return datetime.now().strftime("%H:%M:%S")

    def log(self, msg, display: bool = False, end: str = "\n") -> None:
        if self._log_stream is not None:
            self._log_stream.write(f"[{self.ctime}] {msg}\n")
            self._log_stream.flush()
        if display:
            # SRES_LOG_TO_STDERR=1: keep stdout clean for CLIs with a
            # machine-readable stdout contract (bench.py's one JSON line)
            out = sys.stderr if os.environ.get("SRES_LOG_TO_STDERR") == "1" else sys.stdout
            print(msg, flush=True, end=end, file=out)

    def debug(self, msg) -> None:
        if self._level == logging.DEBUG:
            self.log(msg)

    def fatal(self, msg: str, status: int = 1) -> None:
        print(msg)
        self.log(msg)
        sys.exit(status)

    def exception(self, msg) -> None:
        error_msg = f"\n{msg}\n{traceback.format_exc()}\n"
        if self._log_stream is not None:
            self._log_stream.write(error_msg)
            self._log_stream.flush()
        print(error_msg, flush=True)

    def trace(self, msg) -> None:
        strace = "".join(traceback.format_stack())
        self.log(f"\n{msg}\n{strace}\n")
