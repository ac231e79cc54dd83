"""Structured training-metrics logging.

The reference logs via print/tqdm only (TensorBoard exists solely in a
legacy path — SURVEY.md §5). Here: a JSONL metrics logger every trainer
can append to — trivially greppable/plottable and diffable across runs.
"""

from __future__ import annotations

import json
import os
import os.path as osp
import time

class MetricsLogger:
    def __init__(self, expdir: str, name: str = "metrics"):
        os.makedirs(expdir, exist_ok=True)
        self.path = osp.join(expdir, f"{name}.jsonl")
        self._t0 = time.time()

    def log(self, step: int, **metrics):
        rec = {"step": int(step), "wall_s": round(time.time() - self._t0, 2)}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = v
        with open(self.path, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        return rec

    def read(self):
        if not osp.exists(self.path):
            return []
        with open(self.path) as fh:
            return [json.loads(l) for l in fh if l.strip()]
