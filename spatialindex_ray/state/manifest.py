"""Per-partition checkpoint manifest with lineage + row/byte metrics.

The engine's resumability contract (north_rule): every completed partition
of a pipeline records (partition_id, input fingerprint, row count, byte
count, stage metrics, wall time). A re-run skips partitions whose
fingerprint matches; everything derived from `url`/ids alone is recomputed
idempotently. The reference has no checkpointing (SURVEY §4.1) — its restart
points are whole intermediate files; partition granularity is the
distributed replacement.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass, field


@dataclass
class PartitionRecord:
    partition_id: str
    input_fingerprint: str
    rows: int
    bytes: int
    wall_s: float
    extra: dict = field(default_factory=dict)
    completed_at: float = field(default_factory=time.time)


class Manifest:
    """JSON-file-backed manifest. Writes are atomic (tmp + rename) so a
    crash mid-update never corrupts the checkpoint state."""

    def __init__(self, path: str):
        self.path = path
        self._records: dict[str, dict] = {}
        self.stage_metrics: dict[str, dict] = {}
        if os.path.exists(path):
            with open(path) as f:
                data = json.load(f)
            self._records = data.get("partitions", {})
            self.stage_metrics = data.get("stage_metrics", {})

    def is_complete(self, partition_id: str, input_fingerprint: str) -> bool:
        rec = self._records.get(partition_id)
        return rec is not None and rec["input_fingerprint"] == input_fingerprint

    def record(self, rec: PartitionRecord):
        self._records[rec.partition_id] = asdict(rec)
        self.flush()

    def record_stage_metrics(self, stage: str, metrics: dict):
        self.stage_metrics[stage] = metrics
        self.flush()

    def partitions(self) -> dict[str, dict]:
        return dict(self._records)

    def total_rows(self) -> int:
        return sum(r["rows"] for r in self._records.values())

    def total_bytes(self) -> int:
        return sum(r["bytes"] for r in self._records.values())

    def flush(self):
        tmp = self.path + ".tmp"
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        with open(tmp, "w") as f:
            json.dump(
                {"partitions": self._records, "stage_metrics": self.stage_metrics},
                f,
                indent=1,
            )
        os.replace(tmp, self.path)
