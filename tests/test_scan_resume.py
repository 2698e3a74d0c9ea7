"""Chunked resumable scan (C2): the reference checkpoints the backfill
per bulk chunk (src/processor.ts:313-321) so a killed process resumes
mid-collection; here each sampled id-range chunk advances the scan
checkpoint once loaded."""

from __future__ import annotations

import pytest

from mongo_es_spark.config import Task
from mongo_es_spark.streaming.sink import ParquetIndexSink
from mongo_es_spark.streaming.tail import run_scan

TASK_SPEC = {
    "from": {"phase": "scan"},
    "extract": {"db": "db", "collection": "c"},
    "transform": {"mapping": {"name": "name"}},
    "load": {"index": "i", "type": "t"},
}


@pytest.fixture()
def checkpoints():
    saved: list = []
    Task.on_save_checkpoint(lambda name, cp: saved.append(cp))
    Task.on_load_checkpoint(lambda name: None)
    yield saved
    Task.on_save_callback = None
    Task.on_load_callback = None


def _source(spark, n=100):
    return spark.createDataFrame(
        [(f"{i:04d}", f"doc{i}") for i in range(n)],
        "_id string, name string",
    )


def test_chunked_scan_advances_checkpoint_and_loads_all(
    spark, tmp_path, checkpoints
):
    task = Task(TASK_SPEC)
    sink = ParquetIndexSink(str(tmp_path / "idx"))
    run_scan(spark, task, _source(spark), sink, resume_chunks=4)

    state = sink.read_state(spark)
    assert state.count() == 100
    scan_cps = [c for c in checkpoints if c.phase == "scan"]
    # intermediate scan checkpoints advanced in id order before the
    # final flip to tail
    assert len(scan_cps) >= 2
    ids = [c.id for c in scan_cps]
    assert ids == sorted(ids)
    assert checkpoints[-1].phase == "tail"


def test_crashed_scan_resumes_from_chunk_checkpoint(
    spark, tmp_path, checkpoints
):
    class FlakySink(ParquetIndexSink):
        def __init__(self, path):
            super().__init__(path)
            self.applies = 0
            self.fail_at: int | None = None

        def apply(self, spark, irs, batch_id):
            self.applies += 1
            if self.fail_at is not None and self.applies >= self.fail_at:
                raise RuntimeError("simulated crash mid-scan")
            super().apply(spark, irs, batch_id)

    task = Task(TASK_SPEC)
    sink = FlakySink(str(tmp_path / "idx"))
    sink.fail_at = 3  # chunks 1-2 land, chunk 3 dies
    with pytest.raises(RuntimeError, match="mid-scan"):
        run_scan(spark, task, _source(spark), sink, resume_chunks=4)
    partial = sink.read_state(spark).count()
    assert 0 < partial < 100
    saved = [c for c in checkpoints if c.phase == "scan"]
    assert saved, "completed chunks must have checkpointed"

    # restart: a fresh task loads the last scan checkpoint (the
    # runner's loadCheckpoint path) and resumes from it
    task2 = Task(TASK_SPEC)
    task2.from_ = saved[-1]
    sink.fail_at = None
    applies_before = sink.applies
    run_scan(spark, task2, _source(spark), sink, resume_chunks=4)
    assert sink.read_state(spark).count() == 100
    # the resumed run pushed id >= checkpoint down, so it re-applied
    # fewer chunks than a full scan would
    assert sink.applies - applies_before <= 4
    assert checkpoints[-1].phase == "tail"
