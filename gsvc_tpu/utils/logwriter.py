"""Append-to-file logger matching the reference `LogWriter` (utils.py:10-18).

Keeps the exact train.txt line format so downstream result-parsing tooling
written for the reference keeps working.
"""

from __future__ import annotations

import os


class LogWriter:
    def __init__(self, file_path, train: bool = True, suffix: str = ""):
        """suffix: per-host shard tag for multi-host runs (e.g. ".host0");
        shards are merged by parallel.multihost.merge_host_artifacts."""
        os.makedirs(file_path, exist_ok=True)
        name = ("train" if train else "test") + suffix + ".txt"
        self.file_path = os.path.join(str(file_path), name)

    def write(self, text: str) -> None:
        print(text)
        with open(self.file_path, "a") as f:
            f.write(text + "\n")
