"""streaming.incremental_load: JSON-array file stream → foreachBatch merge
into a ParquetTable — the streaming form of the reference's daily load
(new files drained exactly once, facts stay unique across drains)."""

from __future__ import annotations

from datetime import date

from pyspark.sql import functions as F

from youtube_etl_project_spark import schemas
from youtube_etl_project_spark.operators.upsert import (
    ParquetTable,
    insert_only_merge,
)
from youtube_etl_project_spark.streaming.pipeline import incremental_load
from youtube_etl_project_spark.testkit import make_video, write_json_array_file

DAY = date(2024, 3, 2)


def test_incremental_load_merges_each_batch_once(spark, tmp_path):
    root = str(tmp_path / "raw")
    ckpt = str(tmp_path / "ckpt")
    table = ParquetTable(spark, str(tmp_path / "facts"))

    def on_batch(df, batch_id):
        batch = df.filter(F.col("video_id").isNotNull()).dropDuplicates(
            ["video_id"]
        )
        if table.exists():
            table.write(insert_only_merge(table.read(), batch, ["video_id"]))
        else:
            table.write(batch)

    glob = str(tmp_path / "raw" / "*" / "*" / "*" / "*")
    write_json_array_file(
        root, DAY, "videos",
        [make_video("v1"), make_video("v2"), make_video("v2")],
        ts_suffix="t1",
    )
    q = incremental_load(spark, glob, schemas.VIDEO_SCHEMA, ckpt, on_batch)
    q.awaitTermination(120)
    assert {r.video_id for r in table.read().collect()} == {"v1", "v2"}

    # second drain: one new file, overlapping ids — only v3 appends
    write_json_array_file(
        root, DAY, "videos",
        [make_video("v2", view_count=999), make_video("v3")],
        ts_suffix="t2",
    )
    q2 = incremental_load(spark, glob, schemas.VIDEO_SCHEMA, ckpt, on_batch)
    q2.awaitTermination(120)
    rows = {r.video_id: r.view_count for r in table.read().collect()}
    assert set(rows) == {"v1", "v2", "v3"}
    assert rows["v2"] == 100  # immutable: first write wins

    # third drain with no new files: no change
    q3 = incremental_load(spark, glob, schemas.VIDEO_SCHEMA, ckpt, on_batch)
    q3.awaitTermination(120)
    assert table.read().count() == 3
