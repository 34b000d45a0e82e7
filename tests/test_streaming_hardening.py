"""Streaming/sources hardening pins (round-7 self-review findings):

- intra-micro-batch duplicate sales keys resolve keep-last-by-file
  before the keyed upsert (the row-level analog of validate_batch's
  whole-file V4 check) instead of double-counting in sales_tgt;
- merge_rollup_batch treats ONLY missing/empty serving tables as
  "first batch"; any other analysis failure raises instead of
  dynamically overwriting day partitions with batch-only partials;
- the streaming quarantine's rows re-drive through
  reprocess_quarantine (shared ingest_batch= layout + _ingest_batch
  provenance across both faces);
- the sales_feed source ignores subdirectories in the feed dir and
  fails loudly on a checkpointed offset whose shape does not match the
  configured mode;
- stream_events_rollup accepts an explicit schema so it can start
  watching an empty events directory.
"""

import os

import pytest
from pyspark.sql import functions as F

from enterprise_sales_data_pipeline_using_aws_lambda_spark.pipeline import (
    PipelineConfig,
)

HDR = (
    "uuid,Country,ItemType,SalesChannel,OrderPriority,OrderDate,Region,"
    "ShipDate,UnitsSold,UnitPrice,UnitCost,TotalRevenue,TotalCost,"
    "TotalProfit"
)


def _row(uuid, units=1, price=2.0):
    return (
        f"{uuid},Kenya,Beverages,Offline,L,03/24/2016,Asia,04/05/2016,"
        f"{units},{price},1.0,{units * price},1.0,1.0"
    )


def _cfg(tmp_path):
    return PipelineConfig(
        lake_dir=str(tmp_path / "lake"),
        warehouse_dir=str(tmp_path / "wh"),
        quarantine_dir=str(tmp_path / "quarantine"),
    )


def test_stream_intra_batch_dup_key_keeps_last_file(spark, tmp_path):
    """Two files in ONE drained micro-batch carry the same uuid: the
    keyed sales_tgt must hold exactly the later file's row (the result
    sequential one-event-one-run processing would produce), while the
    append-only sales log keeps every row (the audit record)."""
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.streaming.pipeline import (  # noqa: E501
        stream_sales_ingest,
    )

    raw = tmp_path / "raw"
    raw.mkdir()
    (raw / "a_first.csv").write_text(
        "\n".join([HDR, _row(1, units=5), _row(2, units=1)]) + "\n"
    )
    (raw / "b_second.csv").write_text(
        "\n".join([HDR, _row(1, units=9), _row(3, units=1)]) + "\n"
    )
    cfg = _cfg(tmp_path)
    q = stream_sales_ingest(
        spark, str(raw), cfg, str(tmp_path / "ckpt"), available_now=True
    )
    q.awaitTermination(120)
    tgt = {
        r["uuid"]: r["UnitsSold"]
        for r in spark.read.parquet(
            f"{cfg.warehouse_dir}/sales_tgt"
        ).collect()
    }
    assert tgt == {1: 9, 2: 1, 3: 1}  # one row per key, b_second wins
    # audit log keeps all four rows
    assert spark.read.parquet(f"{cfg.warehouse_dir}/sales").count() == 4
    # summary aggregates the deduped batch: Kenya revenue 9*2+1*2+1*2
    summary = spark.read.parquet(
        f"{cfg.warehouse_dir}/sales_summary"
    ).collect()
    assert len(summary) == 1
    # deduped batch: revenues (18, 2, 2) -> mean 22/3
    assert summary[0]["average_total_revenue"] == pytest.approx(22 / 3)


def test_stream_keep_last_orders_by_arrival_not_path(spark, tmp_path):
    """The intra-batch keep-last must resolve by ARRIVAL order (file
    modification time), not path-string order: a later-arriving file
    whose name sorts EARLIER must still win the key (ADVICE r7 — the
    path proxy only matches arrival when feed names happen to sort
    chronologically)."""
    import time

    from enterprise_sales_data_pipeline_using_aws_lambda_spark.streaming.pipeline import (  # noqa: E501
        stream_sales_ingest,
    )

    raw = tmp_path / "raw"
    raw.mkdir()
    # z_... arrives FIRST, a_... arrives LATER but sorts earlier;
    # pin mtimes explicitly so the ordering is deterministic even when
    # both writes land in the same filesystem timestamp tick
    now = time.time()
    zf = raw / "z_arrives_first.csv"
    zf.write_text("\n".join([HDR, _row(1, units=5)]) + "\n")
    os.utime(zf, (now - 3600, now - 3600))
    af = raw / "a_arrives_second.csv"
    af.write_text("\n".join([HDR, _row(1, units=9)]) + "\n")
    os.utime(af, (now, now))

    cfg = _cfg(tmp_path)
    q = stream_sales_ingest(
        spark, str(raw), cfg, str(tmp_path / "ckpt"), available_now=True
    )
    q.awaitTermination(120)
    tgt = spark.read.parquet(f"{cfg.warehouse_dir}/sales_tgt").collect()
    assert len(tgt) == 1
    assert tgt[0]["UnitsSold"] == 9  # the later ARRIVAL won
    # audit log keeps both rows
    assert spark.read.parquet(f"{cfg.warehouse_dir}/sales").count() == 2


def test_rollup_merge_raises_on_unreadable_existing_table(
    spark, tmp_path,
):
    """A non-missing-table analysis failure while reading the existing
    rollup must PROPAGATE: falling through to the "first batch" path
    would dynamically overwrite day partitions with batch-only
    partials, erasing prior totals."""
    import unittest.mock as mock

    from pyspark.errors import AnalysisException

    from enterprise_sales_data_pipeline_using_aws_lambda_spark.streaming.rollup import (  # noqa: E501
        ROLLUP_TABLE,
        merge_rollup_batch,
    )

    serving = str(tmp_path / "serving")
    events = spark.createDataFrame(
        [(1, "click", "2024-01-01 10:00:00", 5.0)],
        "event_id long, event_type string, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    merge_rollup_batch(spark, events, serving, batch_id=1)
    before = sorted(
        map(
            tuple,
            spark.read.parquet(f"{serving}/{ROLLUP_TABLE}")
            .select("day", "event_type", "n_events")
            .collect(),
        )
    )
    with mock.patch(
        "pyspark.sql.readwriter.DataFrameReader.parquet",
        side_effect=AnalysisException("[TABLE_MID_SWAP] boom"),
    ):
        with pytest.raises(AnalysisException):
            merge_rollup_batch(spark, events, serving, batch_id=2)
    after = sorted(
        map(
            tuple,
            spark.read.parquet(f"{serving}/{ROLLUP_TABLE}")
            .select("day", "event_type", "n_events")
            .collect(),
        )
    )
    assert after == before  # nothing was overwritten


def test_streaming_quarantine_rows_reprocess_without_crash(
    spark, tmp_path,
):
    """Rows quarantined by the STREAMING face re-drive through
    reprocess_quarantine: both faces share the ingest_batch= layout
    and the _ingest_batch provenance column, so the recovery path that
    previously crashed on the missing column now runs (still-invalid
    rows are re-quarantined whole-batch, the batch-path posture)."""
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.pipeline import (
        reprocess_quarantine,
    )
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.streaming.pipeline import (  # noqa: E501
        stream_sales_ingest,
    )

    raw = tmp_path / "raw"
    raw.mkdir()
    bad = _row(7).replace("03/24/2016", "13/45/2016")  # invalid date
    (raw / "a.csv").write_text("\n".join([HDR, _row(1), bad]) + "\n")
    cfg = _cfg(tmp_path)
    q = stream_sales_ingest(
        spark, str(raw), cfg, str(tmp_path / "ckpt"), available_now=True
    )
    q.awaitTermination(120)
    quarantined = spark.read.parquet(cfg.quarantine_dir)
    assert quarantined.count() == 1
    assert "_ingest_batch" in quarantined.columns
    r = reprocess_quarantine(spark, cfg)
    assert r["n_requeued"] == 1
    # the row is still invalid: the re-drive re-quarantines it (batch
    # posture) under a NEW batch id in the SAME directory layout
    assert r["status"] == "failed"
    again = spark.read.parquet(cfg.quarantine_dir)
    assert again.count() == 2
    assert again.select("_ingest_batch").distinct().count() == 2


def test_rollup_backfill_preserves_replay_markers(spark, tmp_path):
    """A batch_id=None (backfill) merge must KEEP the affected days'
    stored replay markers (review r8): stamping -1 would disarm the
    stream's at-least-once guard, so a batch replayed after the
    backfill would re-merge and double-count its day."""
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.streaming.rollup import (  # noqa: E501
        ROLLUP_TABLE,
        merge_rollup_batch,
    )

    serving = str(tmp_path / "serving")

    def events(eid, value):
        return spark.createDataFrame(
            [(eid, "click", "2024-01-01 10:00:00", value)],
            "event_id long, event_type string, ts string, value double",
        ).withColumn("ts", F.col("ts").cast("timestamp"))

    # stream batch 7 lands on day D
    merge_rollup_batch(spark, events(1, 5.0), serving, batch_id=7)
    # operator backfill touching the same day, outside any checkpoint
    merge_rollup_batch(spark, events(2, 3.0), serving, batch_id=None)
    t = spark.read.parquet(f"{serving}/{ROLLUP_TABLE}")
    [r] = t.collect()
    assert r["n_events"] == 2 and r["total_value"] == 8.0
    assert r["last_batch_id"] == 7  # marker preserved, not reset to -1

    # the at-least-once window: batch 7 replays AFTER the backfill —
    # the preserved marker makes it a no-op instead of a double-count
    merge_rollup_batch(spark, events(1, 5.0), serving, batch_id=7)
    [r2] = spark.read.parquet(f"{serving}/{ROLLUP_TABLE}").collect()
    assert r2["n_events"] == 2 and r2["total_value"] == 8.0

    # a NEW day introduced by a backfill starts at the -1 sentinel
    other = spark.createDataFrame(
        [(3, "view", "2024-02-02 09:00:00", 1.0)],
        "event_id long, event_type string, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    merge_rollup_batch(spark, other, serving, batch_id=None)
    rows = {
        str(r["day"]): r["last_batch_id"]
        for r in spark.read.parquet(f"{serving}/{ROLLUP_TABLE}").collect()
    }
    assert rows["2024-01-01"] == 7 and rows["2024-02-02"] == -1


def test_sales_feed_ignores_subdirectories(spark, tmp_path):
    """Subdirectories in the feed dir — an archive/ folder, even one
    named like a feed file — are not feed files: strict batch mode
    must not reject the feed over them, and no partition may be
    planned for a directory."""
    feed = tmp_path / "feed"
    feed.mkdir()
    (feed / "a.csv").write_text("\n".join([HDR, _row(1)]) + "\n")
    (feed / "archive").mkdir()
    (feed / "2024.json").mkdir()  # a DIRECTORY named like a feed file
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.sources.pysource import (  # noqa: E501
        SalesFeedDataSource,
    )

    spark.dataSource.register(SalesFeedDataSource)
    df = (
        spark.read.format("sales_feed")
        .option("path", str(feed))
        .load()
    )
    assert [r["uuid"] for r in df.collect()] == [1]


def test_sales_feed_offset_shape_mismatch_raises(spark, tmp_path):
    """Flipping the monotonic option across a restart must fail loudly
    instead of silently re-ingesting the whole feed (hwm mode reading
    a files-shaped offset) or KeyErroring (the reverse)."""
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.schema import (
        sales_ingest_schema,
    )
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.sources.pysource import (  # noqa: E501
        SalesFeedStreamReader,
    )

    feed = tmp_path / "feed"
    feed.mkdir()
    (feed / "a.csv").write_text("\n".join([HDR, _row(1)]) + "\n")
    hwm_reader = SalesFeedStreamReader(
        {"path": str(feed), "monotonic": "true"}, sales_ingest_schema()
    )
    with pytest.raises(ValueError, match="offset shape"):
        hwm_reader.partitions({"files": []}, {"files": ["x"]})
    fl_reader = SalesFeedStreamReader(
        {"path": str(feed)}, sales_ingest_schema()
    )
    with pytest.raises(ValueError, match="offset shape"):
        fl_reader.partitions({"hwm": ""}, {"hwm": "x"})


def test_rollup_stream_starts_on_empty_events_dir(spark, tmp_path):
    """With an explicit schema the rollup stream starts before any
    events exist (the watch-a-directory deploy order) and drains
    cleanly; the serving table appears once data lands."""
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.streaming.rollup import (  # noqa: E501
        ROLLUP_TABLE,
        stream_events_rollup,
    )

    events_dir = tmp_path / "events"
    events_dir.mkdir()
    serving = str(tmp_path / "serving")
    schema = (
        "event_id long, event_type string, ts timestamp, value double"
    )
    q = stream_events_rollup(
        spark, str(events_dir), serving, str(tmp_path / "ck1"),
        available_now=True, schema=schema,
    )
    q.awaitTermination(60)  # empty drain, no crash
    assert not os.path.exists(f"{serving}/{ROLLUP_TABLE}")
    spark.createDataFrame(
        [(1, "click", "2024-01-01 10:00:00", 5.0)],
        schema.replace("timestamp", "string"),
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.mode(
        "append"
    ).parquet(str(events_dir))
    q2 = stream_events_rollup(
        spark, str(events_dir), serving, str(tmp_path / "ck1"),
        available_now=True, schema=schema,
    )
    q2.awaitTermination(60)
    roll = spark.read.parquet(f"{serving}/{ROLLUP_TABLE}")
    assert roll.count() == 1


def test_feed_connector_edge_inputs(spark, tmp_path):
    """Connector hardening (review r8): an EMPTY feed directory reads
    as an empty frame (Spark hands read(None) when partitions() is
    empty), a UTF-8 BOM does not null the key column or break JSON
    array dispatch, a JSON float in an integer column nulls out
    (permissive parity) instead of silently truncating, and a
    trailing-slash respelling of the path option yields identical
    partition values (offsets embed the canonical absolute path)."""
    import json as _json

    from enterprise_sales_data_pipeline_using_aws_lambda_spark.sources.pysource import (  # noqa: E501
        SalesFeedDataSource,
        SalesFeedReader,
    )
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.schema import (
        sales_ingest_schema,
    )

    spark.dataSource.register(SalesFeedDataSource)

    # empty feed dir (only bookkeeping) -> empty frame, not a crash
    empty = tmp_path / "empty_feed"
    empty.mkdir()
    (empty / "_SUCCESS").write_text("")
    got = (
        spark.read.format("sales_feed")
        .option("path", str(empty))
        .load()
    )
    assert got.count() == 0

    feed = tmp_path / "feed"
    feed.mkdir()
    # BOM'd CSV: header must not become '﻿uuid'
    (feed / "a.csv").write_bytes(
        "﻿".encode("utf-8")
        + (HDR + "\n" + _row(1, units=5) + "\n").encode("utf-8")
    )
    # BOM'd JSON array: dispatch must still see '['
    rec = {
        "uuid": 2, "Country": "FR", "ItemType": "Meat",
        "SalesChannel": "Offline", "OrderPriority": "L",
        "OrderDate": "2/3/2024", "Region": "Europe",
        "ShipDate": "2/9/2024", "UnitsSold": 2.7, "UnitPrice": 10.0,
        "UnitCost": 6.0, "TotalRevenue": 40.0, "TotalCost": 24.0,
        "TotalProfit": 16.0,
    }
    (feed / "b.json").write_bytes(
        "﻿".encode("utf-8") + _json.dumps([rec]).encode("utf-8")
    )
    rows = {
        r["uuid"]: (r["Country"], r["UnitsSold"])
        for r in spark.read.format("sales_feed")
        .option("path", str(feed))
        .load()
        .collect()
    }
    assert rows[1] == ("Kenya", 5)
    # float 2.7 in the long UnitsSold column nulls (never becomes 2)
    assert rows[2] == ("FR", None)

    # trailing-slash respelling -> identical partition values
    plain = SalesFeedReader({"path": str(feed)}, sales_ingest_schema())
    slashed = SalesFeedReader(
        {"path": str(feed) + "/"}, sales_ingest_schema()
    )
    assert sorted(p.value for p in plain.partitions()) == sorted(
        p.value for p in slashed.partitions()
    )


def test_scalar_helper_edge_semantics(spark):
    """parse_mdY nulls malformed dates instead of throwing under
    ANSI-on (the quarantine-not-crash posture), and stable_hash64
    keeps the SEED effective on NULL inputs (concat null-propagation
    previously collapsed every null to one constant across all
    seeds)."""
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.functions import (
        parse_mdY,
        stable_hash64,
    )

    df = spark.createDataFrame(
        [("1/2/2024",), ("13/45/2020",), ("N/A",), (None,)], "d string"
    )
    parsed = [r[0] for r in df.select(parse_mdY("d")).collect()]
    assert str(parsed[0]) == "2024-01-02"
    assert parsed[1] is None and parsed[2] is None and parsed[3] is None

    h = spark.createDataFrame([(None,)], "t string").select(
        stable_hash64(F.col("t"), 1).alias("h1"),
        stable_hash64(F.col("t"), 2).alias("h2"),
    ).first()
    assert h["h1"] is not None and h["h1"] != h["h2"]
