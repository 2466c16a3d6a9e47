"""Structured metrics logging for training/eval runs.

Replaces the reference's print-based reporting (eval_caco.py:178-179) and
lightning CSVLogger (task_predictions.py:1007) with a JSONL metrics stream +
stdout mirror — greppable, plottable, append-only (crash-safe).
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import numpy as np


class MetricsLogger:
    def __init__(self, path: Optional[str] = None, mirror_stdout: bool = True):
        self.path = path
        self.mirror = mirror_stdout
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)

    def log(self, step: Optional[int] = None, **metrics):
        row = {"time": time.time()}
        if step is not None:
            row["step"] = int(step)
        for k, v in metrics.items():
            if hasattr(v, "item"):
                v = np.asarray(v).item()
            row[k] = v
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(row) + "\n")
        if self.mirror:
            pretty = " ".join(
                f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}"
                for k, v in row.items() if k != "time"
            )
            print(pretty, flush=True)
        return row
