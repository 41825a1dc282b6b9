"""Run logging: reference-format ``log.txt`` plus structured JSONL metrics.

The reference opens log.txt in 'w' with a ``Logger:`` header and re-opens it
for append on EVERY write (first_approach.py:143-144, 216-217;
second_approach.py:135-136, 193-194). This logger keeps the exact same file
format (so downstream tooling parses identically) but holds the handle open,
and mirrors each record into ``metrics.jsonl`` with timing fields
(SURVEY.md §5 "Metrics / logging").
"""

from __future__ import annotations

import json
import os
import time

class RunLogger:
    def __init__(self, output_path: str, jsonl: bool = True):
        os.makedirs(output_path, exist_ok=True)
        self.path = os.path.join(output_path, "log.txt")
        self._fh = open(self.path, "w")
        self._fh.write("Logger:\n")
        self._fh.flush()
        self._jsonl = None
        if jsonl:
            self._jsonl = open(os.path.join(output_path, "metrics.jsonl"), "w")
        self._t0 = time.time()

    def log_step(self, batch: int, step: int, loss: float, **extra) -> None:
        """First-approach format: ``Batch i, Step s, Loss v``."""
        self._fh.write(f"Batch {batch}, Step {step}, Loss {loss}\n")
        self._fh.flush()
        self._metric(dict(batch=batch, step=step, loss=loss, **extra))

    def log_epoch(self, epoch: int, loss: float, **extra) -> None:
        """Second-approach format: ``Epoch e, Loss v``."""
        self._fh.write(f"Epoch {epoch}, Loss {loss}\n")
        self._fh.flush()
        self._metric(dict(epoch=epoch, loss=loss, **extra))

    def _metric(self, record: dict) -> None:
        if self._jsonl is None:
            return
        record["t"] = round(time.time() - self._t0, 4)
        self._jsonl.write(json.dumps(record) + "\n")
        self._jsonl.flush()

    def close(self) -> None:
        self._fh.close()
        if self._jsonl is not None:
            self._jsonl.close()
