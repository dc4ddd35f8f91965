"""Circular (line-capped) file logging.

Rebuild of the reference's CircularLogFile (SURVEY.md section 2a
"FileLogger"; /root/reference/src/file_logger.{h,cc}): keeps the last
max_lines lines, checking/truncating every TRUNCATE_CHECK_INTERVAL lines
via rewrite-through-temp-file (file_logger.cc:70-115). Default capacity
100k lines (file_logger.h:69).
"""

from __future__ import annotations

import logging
import os
import threading

DEFAULT_MAX_LINES = 100_000
TRUNCATE_CHECK_INTERVAL = 1000  # reference file_logger.h:58


class CircularFileHandler(logging.Handler):
    def __init__(self, path: str, max_lines: int = DEFAULT_MAX_LINES):
        super().__init__()
        self.path = path
        self.max_lines = max_lines
        self._lock2 = threading.Lock()
        self._since_check = 0
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._f = open(path, "a", encoding="utf-8")

    def emit(self, record: logging.LogRecord) -> None:
        try:
            line = self.format(record)
            with self._lock2:
                self._f.write(line + "\n")
                self._f.flush()
                self._since_check += 1
                if self._since_check >= TRUNCATE_CHECK_INTERVAL:
                    self._since_check = 0
                    self._truncate_if_needed()
        except Exception:
            self.handleError(record)

    def _truncate_if_needed(self) -> None:
        try:
            with open(self.path, "r", encoding="utf-8", errors="replace") as f:
                lines = f.readlines()
        except OSError:
            return
        if len(lines) <= self.max_lines:
            return
        keep = lines[-self.max_lines :]
        tmp = self.path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            f.writelines(keep)
        self._f.close()
        os.replace(tmp, self.path)
        self._f = open(self.path, "a", encoding="utf-8")

    def close(self) -> None:
        try:
            self._f.close()
        finally:
            super().close()


def setup_file_logging(path: str, max_lines: int = DEFAULT_MAX_LINES,
                       level: str = "INFO") -> CircularFileHandler:
    """Engine-wide log rerouting (reference SetFileLogger,
    llama_engine.cc:510-545)."""
    handler = CircularFileHandler(path, max_lines)
    handler.setFormatter(logging.Formatter(
        "%(asctime)s %(levelname)s %(name)s %(message)s"))
    root = logging.getLogger("tpu_engine")
    root.addHandler(handler)
    root.setLevel(level.upper())
    return handler
