"""Structured run logging: stdout + JSONL metric stream (SURVEY.md §5
"metrics/logging/observability").

The reference family logs epoch loss + eval metrics to per-run text files;
here every record is one JSON object ({"step", "epoch", "wall_s", ...metrics})
so benchmark tooling and the driver can parse runs mechanically.
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Any, Dict, IO


class MetricLogger:
    def __init__(self, run_name: str = "run", out_dir: str | None = None, quiet: bool = False):
        self.run_name = run_name
        self.quiet = quiet
        self.t0 = time.monotonic()
        self._fh: IO[str] | None = None
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            self._fh = open(os.path.join(out_dir, f"{run_name}.metrics.jsonl"), "a")

    def log(self, record: Dict[str, Any]) -> None:
        record = dict(record)
        record.setdefault("wall_s", round(time.monotonic() - self.t0, 3))
        line = json.dumps(record, default=float)
        if self._fh:
            self._fh.write(line + "\n")
            self._fh.flush()
        if not self.quiet:
            print(f"[{self.run_name}] {line}", file=sys.stderr)

    def close(self) -> None:
        if self._fh:
            self._fh.close()
            self._fh = None
