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

Filesystem contract: this connector lists with ``os.listdir`` and reads
with ``open``, so the feed directory must be a POSIX path visible to
BOTH the driver (listing) and every executor (reads) — a local path in
local mode, or a shared mount (NFS/FUSE) on a cluster.  Remote-scheme
URIs (``s3a://``, ``hdfs://``, ...) are rejected at construction
rather than failing obscurely inside executors; route object-store
feeds through ``sources.readers`` (Spark's Hadoop-FS readers) instead.
"""

from __future__ import annotations

import csv
import hashlib
import io
import json
import os
from collections import OrderedDict

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
        # POSIX-only contract (module docstring): os.listdir/open need a
        # driver+executor-shared local view; fail fast on remote URIs
        # instead of surfacing FileNotFoundError inside executors.
        scheme = path.split("://", 1)[0] if "://" in path else ""
        if scheme and scheme != "file":
            raise ValueError(
                f"sales_feed reads via the local filesystem; got scheme "
                f"{scheme!r}. Use sources.readers (Hadoop FS) for "
                f"object-store/HDFS feeds, or mount the feed locally."
            )
        path = path[len("file://"):] if scheme == "file" else path
        # Canonical ABSOLUTE path: partition values (and therefore the
        # streaming face's checkpointed offsets) embed this prefix, so
        # respelling the option across a restart (trailing slash,
        # relative vs absolute) must not change how offsets compare —
        # a relative respelling would otherwise silently re-ingest the
        # entire feed history (every name compares above the old
        # absolute watermark).
        #
        # UPGRADE NOTE (the canonicalization itself moved the goalposts
        # once): feeds whose checkpoints were written by a PRE-
        # canonicalization version under a non-canonical spelling
        # (trailing slash, relative path) have offsets embedding the
        # OLD prefix — the first restart under this version compares
        # against the canonical prefix and can re-ingest or skip the
        # feed history once.  Such feeds must either start a fresh
        # checkpoint on upgrade or keep the old option spelling AND the
        # old version; all checkpoints written by this version are
        # spelling-independent from then on.
        self.path = os.path.abspath(path)
        self.schema = schema
        # strict=false skips unsupported suffixes instead of raising —
        # the pipeline's quarantine-not-crash posture, per file.
        self.strict = str(options.get("strict", "true")).lower() == "true"

    def partitions(self):
        # isfile: a subdirectory in the feed dir (an archive/ folder,
        # a partitioned dataset) is NEVER a feed file — without the
        # check, strict mode rejects the whole healthy feed over it,
        # and a dir named like '2024.json' would be planned as a
        # partition and IsADirectoryError every micro-batch (a
        # permanent wedge in the streaming face, which reuses this
        # listing from latestOffset).
        files = sorted(
            p
            for f in os.listdir(self.path)
            if not f.startswith(("_", "."))
            and os.path.isfile(p := os.path.join(self.path, f))
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
        if partition is None:
            # an empty feed (only bookkeeping files / skipped suffixes)
            # yields zero partitions, and Spark's Python data-source
            # worker substitutes [None] and still calls read —
            # an empty frame, not an AttributeError, is the answer
            return
        fname = partition.value
        names = [f.name for f in self.schema.fields]

        def num_cast(conv):
            # permissive-mode parity with the built-in readers: a
            # malformed cell nulls out, it never fails the file.  A
            # JSON float in an integer column nulls too — int(2.7)
            # would silently fabricate 2 where Spark's permissive JSON
            # reader nulls the cell (CSV is unaffected: its values
            # arrive as strings and int('2.7') raises).
            def cast(v):
                if v in (None, ""):
                    return None
                if conv is int and isinstance(v, float):
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
        # utf-8-sig: identical to utf-8 for BOM-less files, and strips
        # the BOM Windows/Excel exports prepend — under plain utf-8 the
        # BOM becomes part of the first CSV header ('\\ufeffuuid', so
        # the key column silently nulls) and fails JSON array dispatch.
        if fname.lower().endswith(".csv"):
            rdr = csv.DictReader(io.StringIO(payload.decode("utf-8-sig")))
            for rec in rdr:
                yield row_of(rec)
            return
        # JSON: array-of-objects or NDJSON, probed by first byte —
        # the same head-byte dispatch as sources.readers.read_json.
        text = payload.decode("utf-8-sig")
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

    Offsets: by default the CUMULATIVE sorted list of files ever seen —
    the union of every committed offset and every listing, so a
    processed file that is later deleted stays in the offset (its name
    can never be recycled into a re-ingest) and offsets never shrink.
    Correct for ARBITRARY file names (a late file sorting anywhere is
    still picked up), at O(files-seen) offset size; each micro-batch
    plans one ``InputPartition`` per NEW file (set difference
    ``end − start`` — frozen by the offsets themselves, so replaying a
    committed range plans exactly the original file set) and reuses
    the batch reader's per-file parser in executors.  For long-lived
    feeds whose file names are MONOTONIC (timestamped names — the
    common feed convention), ``.option("monotonic", "true")`` switches
    to an O(1) high-watermark offset (``{"hwm": <last name>}``):
    checkpoint entries stay constant-size forever, at the cost that a
    file sorting below the watermark is (correctly, per the contract)
    ignored.

    Offset regression safety (both modes).  Within one reader instance
    the emitted offset is a MONOTONE fold over committed start
    offsets, planned ranges, and listings — a momentarily-empty
    directory (rotation, cleanup) mid-run can never shrink it.  Across
    a RESTART there is one unavoidable API hole: Spark restores the
    checkpointed offset but never hands it to the source before the
    first ``latestOffset`` call, so a fresh instance facing an empty
    listing emits an empty offset — below the checkpointed truth —
    and Spark may commit it.  The reader contains the damage within
    the restarted instance's lifetime, so no file is re-ingested:
    ``partitions`` plans a regressed range as an empty batch while
    folding the true start into its floor/seen-set, and a later batch
    whose START carries the committed regressed offset is corrected
    against that memory (monotonic: start clamped up to the offset
    floor; full-list: files already seen in committed starts are
    subtracted) — distinguished from a legitimate task-retry replay,
    which re-plans its original range faithfully, by the instance's
    planned-range memory.  Residual, accepted: if the process dies
    AGAIN after committing the regressed offset but before any later
    batch folds the truth back in, the next fresh instance cannot
    tell the poisoned checkpoint from a genuinely new stream and will
    re-ingest files still present — closing that needs source-owned
    durable state, which this connector deliberately does not keep
    (offsets live in Spark's checkpoint alone).

    Replay contracts differ by mode.  Full-list offsets freeze the
    exact file set; a file deleted between processing and a replay
    makes the replay fail on open (the data is gone — failure is the
    honest outcome).  The same freeze means a file LISTED by
    latestOffset but deleted before its batch ever processed wedges
    the stream deliberately: every retry and restart replays the
    frozen set and fails on the missing file — silently skipping it
    would let a misconfigured rotation job eat feed data forever with
    no signal.  Operator recovery: restore the file from its source,
    or (accepting the loss) start a fresh checkpoint.  Feeds whose
    files legitimately expire should run monotonic mode, which derives
    a committed range's file set by re-listing ``(lo, hi]`` —
    deterministic ONLY under its naming contract (names are assigned
    monotonically and files persist until processed; a late file named
    inside an already-committed range, or a deletion before replay,
    changes the replayed batch — the same caveat as any
    watermark-based file source).

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
        # monotone EMISSION floor for the high watermark (max of all
        # listings and offsets seen): never regresses, even when the
        # directory is momentarily empty
        self._hwm = ""
        # floor learned from OFFSETS ONLY (start/end values Spark hands
        # to partitions()) — the checkpointed truth.  Kept separate
        # from _hwm: a listing may run ahead of the first planned
        # batch, and clamping against it would wrongly empty a fresh
        # stream's first batch.
        self._offset_floor = ""
        # plan memory, (lo, hi) range → effective lo after poison
        # correction: a retry of a planned range re-plans EXACTLY what
        # was planned first (deterministic), while distinguishing
        # replays from a start offset poisoned by the restart hole
        self._planned: OrderedDict = OrderedDict()
        # full-list mode: cumulative union of every file name seen in
        # offsets or listings — offsets must never shrink
        self._seen_files: set[str] = set()
        # full-list analogs: files named in committed START offsets
        # (the checkpointed truth — anything here was ingested by a
        # committed batch), and planned-range → planned-file-set
        self._committed_files: set[str] = set()
        self._planned_fl: OrderedDict = OrderedDict()

    def initialOffset(self):
        if self._monotonic:
            return {"hwm": ""}
        return {"files": []}

    def latestOffset(self):
        names = sorted(p.value for p in self._batch.partitions())
        if self._monotonic:
            if names:
                self._hwm = max(self._hwm, names[-1])
            # empty listing → current floor, never a regression
            return {"hwm": self._hwm}
        self._seen_files.update(names)
        return {"files": sorted(self._seen_files)}

    def partitions(self, start, end):
        # Offset-shape guard: a checkpoint written in one mode replayed
        # under the other must fail LOUDLY.  Without it, flipping
        # monotonic=true across a restart makes start.get('hwm','')
        # read '' from a files-shaped offset and silently re-plans the
        # entire feed history as new (double-appending everything
        # downstream); the reverse flip KeyErrors deep in planning.
        want = "hwm" if self._monotonic else "files"
        for label, off in (("start", start), ("end", end)):
            if want not in off:
                raise ValueError(
                    f"sales_feed checkpoint offset shape mismatch: "
                    f"{label} offset {sorted(off)} lacks {want!r} — "
                    f"this checkpoint was written with monotonic="
                    f"{str(not self._monotonic).lower()}.  Restart "
                    f"with the original mode, or start a fresh "
                    f"checkpoint for the new one"
                )
        if self._monotonic:
            lo, hi = start.get("hwm", ""), end.get("hwm", "")
            key = (lo, hi)
            if key in self._planned:
                # replay of a range this instance already planned (task
                # retry / batch re-run): reproduce the first decision
                lo = self._planned[key]
            else:
                if lo < self._offset_floor and hi >= self._offset_floor:
                    # start below every offset this instance has seen,
                    # range reaching at-or-past the floor, and not a
                    # replay: the checkpointed start was poisoned by a
                    # regressed emission (restart hole, class
                    # docstring).  Clamp to the offset floor so the
                    # already-ingested (≤ floor) files are not re-read.
                    # (A range lying ENTIRELY below the floor is
                    # instead a replay of an old committed range —
                    # e.g. one evicted from the plan memory — and
                    # re-plans faithfully per the replay contract.)
                    lo = self._offset_floor
                self._planned[key] = lo
                # bounded memory: the engine only ever replays recent
                # batches, so the last 64 ranges suffice
                while len(self._planned) > 64:
                    self._planned.popitem(last=False)
            # fold the committed range into both floors: after a
            # restart the instance floors are empty but `start` carries
            # the checkpointed truth
            self._offset_floor = max(self._offset_floor, lo, hi)
            self._hwm = max(self._hwm, lo, hi)
            # a regressed end (restart hole) plans an empty batch
            # rather than a nonsensical inverted range
            hi = max(lo, hi)
            new = sorted(
                p.value
                for p in self._batch.partitions()
                if lo < p.value <= hi
            )
        else:
            s_files, e_files = set(start["files"]), set(end["files"])
            key = hashlib.md5(
                (",".join(sorted(s_files)) + "|"
                 + ",".join(sorted(e_files))).encode()
            ).hexdigest()
            if key in self._planned_fl:
                # replay of a planned range: identical file set
                new = set(self._planned_fl[key])
            else:
                # files named in earlier committed starts but missing
                # from THIS start were ingested by a committed batch
                # and then dropped by a regressed (shrunk) emission
                # after a restart — do not re-ingest them
                new = (e_files - s_files) - self._committed_files
                self._planned_fl[key] = frozenset(new)
                while len(self._planned_fl) > 64:
                    self._planned_fl.popitem(last=False)
            # fold the committed start into the instance memories: its
            # files were ingested by a committed batch, and the offset
            # emission must never drop below them again
            self._committed_files.update(s_files)
            self._seen_files.update(s_files, e_files)
            new = sorted(new)
        return [InputPartition(f) for f in new]

    def read(self, partition):
        return self._batch.read(partition)

    def commit(self, end) -> None:  # offsets live in the checkpoint
        pass
