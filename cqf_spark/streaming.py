"""Structured Streaming: incremental CQF maintenance.

The reference's closest analog is lock-guarded concurrent insert
(src/gqf.c:146-244) — a single filter mutated by many writers.  The
Spark-native form: each micro-batch builds partial sketches with the
ordinary batch aggregator (vectorized bulk build), merges them into a
running sketch (qf_merge is associative, so stream order is irrelevant),
and persists it with an atomic rename + applied-batch watermark for
exactly-once semantics across restarts (foreachBatch may redeliver a
batch after a crash; replays are detected by batch id and skipped).

Usage::

    b = StreamingSketchBuilder(cfg, "/ckpt/tokens")
    q = b.attach(stream_df, key_col="token")   # returns StreamingQuery
    q.awaitTermination()
    sketch = b.current()
"""

from __future__ import annotations

import json
import os
from typing import Any

from .aggregator import build_sketches, tree_merge
from .config import CqfConfig
from .core import Cqf


class StreamingSketchBuilder:
    def __init__(self, config: CqfConfig, state_dir: str):
        self.config = config
        self.state_dir = state_dir
        os.makedirs(state_dir, exist_ok=True)

    @property
    def _sketch_path(self) -> str:
        return os.path.join(self.state_dir, "current.cqf")

    @property
    def _meta_path(self) -> str:
        return os.path.join(self.state_dir, "applied.json")

    def _load_meta(self) -> dict[str, Any]:
        try:
            with open(self._meta_path) as f:
                return json.load(f)
        except (OSError, ValueError):
            return {"last_batch_id": -1, "batches": 0, "rows": 0}

    def current(self) -> Cqf | None:
        """The running sketch (None before the first batch commits)."""
        try:
            with open(self._sketch_path, "rb") as f:
                return Cqf.from_bytes(f.read())
        except OSError:
            return None

    def _commit(self, sketch: Cqf, meta: dict[str, Any]) -> None:
        tmp = self._sketch_path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(sketch.to_bytes())
        os.replace(tmp, self._sketch_path)
        mtmp = self._meta_path + ".tmp"
        with open(mtmp, "w") as f:
            json.dump(meta, f)
        os.replace(mtmp, self._meta_path)

    def process_batch(self, batch_df: Any, batch_id: int, key_col: str) -> None:
        """foreachBatch body — also callable directly for testing."""
        meta = self._load_meta()
        if batch_id <= meta["last_batch_id"]:
            return  # replayed batch after restart: already applied
        n = batch_df.count()
        running = self.current()
        if n:
            part = tree_merge(build_sketches(batch_df, key_col, self.config))
            merged = part if running is None else running.merge(part)
        else:
            merged = running or tree_merge(
                build_sketches(batch_df, key_col, self.config)
            )
        self._commit(
            merged,
            {
                "last_batch_id": batch_id,
                "batches": meta["batches"] + 1,
                "rows": meta["rows"] + n,
            },
        )

    def attach(
        self,
        stream_df: Any,
        key_col: str,
        trigger: dict[str, Any] | None = None,
        query_name: str = "cqf_stream",
    ) -> Any:
        """Start the streaming query; sketch state lives in state_dir, the
        stream's own offsets in state_dir/spark_ckpt (so a restarted query
        resumes from the right offset AND the sketch watermark agrees)."""

        def fn(batch_df: Any, batch_id: int) -> None:
            self.process_batch(batch_df, batch_id, key_col)

        writer = (
            stream_df.writeStream.foreachBatch(fn)
            .queryName(query_name)
            .option(
                "checkpointLocation", os.path.join(self.state_dir, "spark_ckpt")
            )
        )
        if trigger:
            writer = writer.trigger(**trigger)
        return writer.start()
