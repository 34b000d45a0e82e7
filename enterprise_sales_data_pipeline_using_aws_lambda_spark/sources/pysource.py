"""Custom Python Data Source (Spark 4 ``pyspark.sql.datasource``) for
the reference's sales-feed layout.

The reference's ingestion surface is "an S3 object arrives; dispatch on
its suffix; parse CSV or JSON (array or NDJSON); anything else is
unsupported" (reference ``lambda.py:59-75``).  ``sources.readers``
expresses that with Spark's built-in readers; this module expresses the
SAME surface as a first-class **connector**, the way a production feed
with a format Spark doesn't ship (a vendor API, an internal queue dump)
would be integrated:

- one ``InputPartition`` per feed file → file-parallel ingestion across
  executors, no driver-side parsing;
- suffix dispatch inside the partition reader (csv / json-array /
  ndjson).  An unsupported suffix under the default ``strict=true``
  fails FAST at planning with ``UnsupportedFormatError`` (the
  reference's per-object policy, ``lambda.py:73-75`` — its Lambda runs
  one object per invocation, so object failure == run failure);
  ``strict=false`` skips foreign files instead.  The STREAMING face
  always skips them: a strict planning error inside ``latestOffset``
  would wedge every subsequent micro-batch behind one stray file;
- malformed numeric FIELDS null out per value (mirroring the built-in
  readers' permissive mode) — a bad cell never fails a file;
- the explicit ingest schema (``schema.sales_ingest_schema``): no
  inference scan, deterministic types — the 100 TB posture.

Registration is per-session::

    spark.dataSource.register(SalesFeedDataSource)
    df = spark.read.format("sales_feed").option("path", feed_dir).load()

Scale note: ``partitions()`` lists the directory on the driver (names
only — O(files) strings, the same metadata cost as any file source);
row parsing happens in executors via the Arrow batch channel.
"""

from __future__ import annotations

import csv
import io
import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from ..schema import sales_ingest_schema

#: Feed suffixes this connector accepts — reference ``lambda.py:63-71``.
SUPPORTED_SUFFIXES = (".csv", ".json")


class SalesFeedDataSource(DataSource):
    """``spark.read.format("sales_feed").option("path", dir)``."""

    @classmethod
    def name(cls) -> str:
        return "sales_feed"

    def schema(self) -> StructType:
        return sales_ingest_schema()

    def reader(self, schema: StructType) -> "SalesFeedReader":
        return SalesFeedReader(self.options, schema)

    def streamReader(self, schema: StructType) -> "SalesFeedStreamReader":
        return SalesFeedStreamReader(self.options, schema)


class SalesFeedReader(DataSourceReader):
    def __init__(self, options, schema: StructType) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("sales_feed requires .option('path', dir)")
        self.path = path
        self.schema = schema
        # strict=false skips unsupported suffixes instead of raising —
        # the pipeline's quarantine-not-crash posture, per file.
        self.strict = str(options.get("strict", "true")).lower() == "true"

    def partitions(self):
        files = sorted(
            os.path.join(self.path, f)
            for f in os.listdir(self.path)
            if not f.startswith(("_", "."))
        )
        good = [
            f for f in files if f.lower().endswith(SUPPORTED_SUFFIXES)
        ]
        if self.strict and len(good) != len(files):
            # same policy as sources.readers.read_any (reference
            # lambda.py:73-75): unsupported suffix is a caller error
            from .readers import UnsupportedFormatError

            bad = [f for f in files if f not in set(good)]
            raise UnsupportedFormatError(
                f"unsupported feed file(s): {bad}"
            )
        return [InputPartition(f) for f in good]

    def read(self, partition):
        fname = partition.value
        names = [f.name for f in self.schema.fields]

        def num_cast(conv):
            # permissive-mode parity with the built-in readers: a
            # malformed cell nulls out, it never fails the file
            def cast(v):
                if v in (None, ""):
                    return None
                try:
                    return conv(v)
                except (ValueError, TypeError):
                    return None

            return cast

        casts = []
        for f in self.schema.fields:
            t = f.dataType.typeName()
            if t in ("long", "integer"):
                casts.append(num_cast(int))
            elif t == "double":
                casts.append(num_cast(float))
            else:
                casts.append(lambda v: None if v is None else str(v))

        def row_of(rec: dict):
            return tuple(
                cast(rec.get(name)) for name, cast in zip(names, casts)
            )

        with open(fname, "rb") as fh:
            payload = fh.read()
        if fname.lower().endswith(".csv"):
            rdr = csv.DictReader(io.StringIO(payload.decode("utf-8")))
            for rec in rdr:
                yield row_of(rec)
            return
        # JSON: array-of-objects or NDJSON, probed by first byte —
        # the same head-byte dispatch as sources.readers.read_json.
        text = payload.decode("utf-8")
        stripped = text.lstrip()
        if stripped.startswith("["):
            for rec in json.loads(stripped):
                yield row_of(rec)
        else:
            for line in text.splitlines():
                if line.strip():
                    yield row_of(json.loads(line))


class SalesFeedStreamReader(DataSourceStreamReader):
    """Micro-batch streaming face of the feed — the reference's
    event-driven model (an object ARRIVES, a batch runs; reference
    ``lambda.py:39-57``) as a Spark structured-streaming source.

    Offsets: by default the sorted list of files already ingested —
    correct for ARBITRARY file names (a late file sorting anywhere is
    still picked up), at O(files-seen) offset size; each micro-batch
    plans one ``InputPartition`` per NEW file and reuses the batch
    reader's per-file parser in executors.  For long-lived feeds whose
    file names are MONOTONIC (timestamped names — the common feed
    convention), ``.option("monotonic", "true")`` switches to an O(1)
    high-watermark offset (``{"hwm": <last name>}``): checkpoint
    entries stay constant-size forever, at the cost that a file
    sorting below the watermark is (correctly, per the contract)
    ignored.  The watermark is MONOTONE: the reader folds committed
    start offsets and prior listings into an instance-level floor, so
    a momentarily-empty directory (rotation, cleanup) can never
    regress it and re-ingest restored older files.

    Replay contracts differ by mode.  Full-list offsets freeze the
    exact file set: replaying a committed range re-reads the same
    files.  Monotonic mode derives a committed range's file set by
    re-listing ``(lo, hi]`` — deterministic ONLY under its naming
    contract (names are assigned monotonically and files persist until
    processed; a late file named inside an already-committed range, or
    a deletion before replay, changes the replayed batch — the same
    caveat as any watermark-based file source).

    Unsupported-suffix files are ALWAYS skipped here regardless of
    ``strict``: a planning-time error inside ``latestOffset`` would
    abort every micro-batch and restart behind one stray file —
    the batch reader's fail-fast policy would become a permanent
    wedge."""

    def __init__(self, options, schema: StructType) -> None:
        opts = dict(options)
        opts["strict"] = "false"
        self._batch = SalesFeedReader(opts, schema)
        self._monotonic = (
            str(options.get("monotonic", "false")).lower() == "true"
        )
        # monotone floor for the high watermark: never regresses, even
        # when the directory is momentarily empty
        self._hwm = ""

    def initialOffset(self):
        if self._monotonic:
            return {"hwm": ""}
        return {"files": []}

    def latestOffset(self):
        names = sorted(p.value for p in self._batch.partitions())
        if self._monotonic:
            if names:
                self._hwm = max(self._hwm, names[-1])
            return {"hwm": self._hwm}
        return {"files": names}

    def partitions(self, start, end):
        if self._monotonic:
            lo, hi = start.get("hwm", ""), end.get("hwm", "")
            # fold the committed start into the floor: after a restart
            # the instance floor is empty but `start` carries the
            # checkpointed truth
            self._hwm = max(self._hwm, lo)
            new = sorted(
                p.value
                for p in self._batch.partitions()
                if lo < p.value <= hi
            )
        else:
            new = sorted(set(end["files"]) - set(start["files"]))
        return [InputPartition(f) for f in new]

    def read(self, partition):
        return self._batch.read(partition)

    def commit(self, end) -> None:  # offsets live in the checkpoint
        pass
