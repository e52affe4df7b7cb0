"""Training metrics/summaries writer.

The reference writes TensorBoard scalars through Orbit's summary manager
(trainer.py:174-175, summary_interval=10).  Here metrics go to a JSONL file
(always) and to TensorBoard event files when TensorFlow is importable —
TF is only an optional sink, never a core dependency.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricsWriter:
    def __init__(self, summary_dir: Optional[str]):
        self.summary_dir = summary_dir
        self._jsonl = None
        self._tb = None
        if summary_dir:
            os.makedirs(summary_dir, exist_ok=True)
            self._jsonl = open(os.path.join(summary_dir, "metrics.jsonl"),
                               "a", buffering=1)
            try:
                import tensorflow as tf  # optional sink
                self._tb = tf.summary.create_file_writer(summary_dir)
            except Exception:
                self._tb = None

    def write(self, step: int, metrics: Dict[str, float]) -> None:
        if self._jsonl is not None:
            rec = {"step": int(step), "time": time.time()}
            rec.update({k: float(v) for k, v in metrics.items()})
            self._jsonl.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            import tensorflow as tf
            with self._tb.as_default():
                for k, v in metrics.items():
                    tf.summary.scalar(k, float(v), step=int(step))
            self._tb.flush()

    def close(self) -> None:
        if self._jsonl is not None:
            self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
