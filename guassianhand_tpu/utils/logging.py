"""Run logging: JSONL scalar stream + stdout (SURVEY.md §5.5 — replaces the
reference's TestTubeLogger with a dependency-free equivalent readable by any
tooling)."""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class RunLogger:
    def __init__(self, run_dir: str, filename: str = "metrics.jsonl",
                 echo: bool = True):
        os.makedirs(run_dir, exist_ok=True)
        self.path = os.path.join(run_dir, filename)
        self._f = open(self.path, "a")
        self.echo = echo
        self._t0 = time.time()

    def log(self, step: int, scalars: Dict[str, float],
            prefix: Optional[str] = None) -> None:
        rec = {"step": step, "t": round(time.time() - self._t0, 3)}
        for k, v in scalars.items():
            key = f"{prefix}/{k}" if prefix else k
            rec[key] = float(v)
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self.echo:
            parts = " ".join(f"{k}={v:.5g}" for k, v in rec.items()
                             if k not in ("step", "t"))
            print(f"[step {step}] {parts}")

    def close(self):
        self._f.close()
