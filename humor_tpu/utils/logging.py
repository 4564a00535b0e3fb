"""Minimal file+stdout logger and naming helpers.

Parity target: /root/reference/humor/utils/logging.py (static Logger,
mkdir, CamelCase->snake_case)."""

from __future__ import annotations

import datetime
import os
import re
from typing import Optional


class Logger:
    """Prints and appends timestamped lines to a log file."""

    log_file: Optional[str] = None

    @classmethod
    def init(cls, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        cls.log_file = path
        with open(path, "a") as f:
            f.write(f"=== log opened {datetime.datetime.now()} ===\n")

    @classmethod
    def log(cls, msg: str) -> None:
        stamp = datetime.datetime.now().strftime("%H:%M:%S")
        line = f"[{stamp}] {msg}"
        print(line, flush=True)
        if cls.log_file:
            with open(cls.log_file, "a") as f:
                f.write(line + "\n")


def class_name_to_file_name(name: str) -> str:
    """CamelCase -> snake_case (for config-driven dynamic lookup)."""
    return re.sub(r"(?<!^)(?=[A-Z])", "_", name).lower()


def mkdir(path: str) -> None:
    os.makedirs(path, exist_ok=True)
