"""Format-dispatch readers (reference operators S1–S4).

The reference fetches one S3 object and dispatches on the key suffix:
``.csv`` → ``pd.read_csv``, ``.json`` → record-array parse with an NDJSON
fallback, anything else raises (reference ``lambda.py:58-79``).  Here the
same dispatch becomes declarative ``spark.read`` plans so Catalyst gets
predicate pushdown / column pruning for free, and one call can ingest a
whole directory of files instead of one object at a time.

Scale notes:
- explicit schema by default — no inference scan over 100 TB;
- ``read_any(..., infer=True)`` keeps the reference's infer-then-validate
  behavior for small ad-hoc files;
- JSON: Spark natively reads NDJSON; ``multiLine=True`` handles the
  record-array form.  The reference tries record-array **first** and falls
  back to NDJSON (``lambda.py:66-71``); we probe cheaply on the first
  bytes of one file instead of parsing the whole input twice.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schema import sales_ingest_schema

STAR_TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


class UnsupportedFormatError(ValueError):
    """Raised for unknown file extensions (reference ``lambda.py:73-74``)."""


def _looks_like_json_array(spark: SparkSession, path: str) -> bool:
    """Cheap probe: does the first non-space byte start a JSON array?

    Mirrors the reference's try-record-array-first dispatch
    (``lambda.py:66-71``) without double-parsing: read only the head of
    one file through the Hadoop FS API (works for any supported scheme).
    """
    sc = spark.sparkContext
    hconf = sc._jsc.hadoopConfiguration()
    jvm = sc._jvm
    try:
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(hconf)
        target = hpath
        if not fs.exists(hpath):
            # glob pattern (dir/*.json — a path spark.read.json itself
            # accepts): resolve to the first matching non-empty file
            matches = fs.globStatus(hpath)
            files = [
                st
                for st in (matches or [])
                if st.isFile() and st.getLen() > 0
            ]
            if not files:
                return False
            target = files[0].getPath()
        elif fs.isDirectory(hpath):
            for st in fs.listStatus(hpath):
                if st.isFile() and st.getLen() > 0:
                    target = st.getPath()
                    break
            else:
                return False
        stream = fs.open(target)
        try:
            # 256 probes bounds the py4j round-trips (read() is one JVM
            # call per byte); a JSON array behind more than 256 bytes
            # of leading whitespace falls back to the NDJSON path,
            # whose reader will surface the malformed-record error
            for _ in range(256):
                b = stream.read()
                if b < 0:
                    return False
                ch = chr(b)
                if ch.isspace():
                    continue
                return ch == "["
        finally:
            stream.close()
        return False
    except Exception:
        # the probe is an OPTIMIZATION — any filesystem hiccup falls
        # back to the NDJSON reader rather than failing a read Spark
        # could have served
        return False


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    infer: bool = False,
    sep: str = ",",
) -> DataFrame:
    """CSV source (reference S2, ``lambda.py:64-65``).  ``sep`` serves
    the TSV dispatch too — ONE reader construction, so a future read
    option lands in every delimited format at once."""
    reader = spark.read.option("header", True).option("sep", sep)
    if schema is not None and not infer:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    infer: bool = False,
) -> DataFrame:
    """JSON source (reference S3, ``lambda.py:66-71``).

    Handles both NDJSON (Spark-native) and a single top-level JSON array
    (``multiLine``), chosen by probing the first non-space byte.
    """
    reader = spark.read
    if schema is not None and not infer:
        reader = reader.schema(schema)
    if _looks_like_json_array(spark, path):
        reader = reader.option("multiLine", True)
    return reader.json(path)


def read_any(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    infer: bool = False,
) -> DataFrame:
    """Suffix-dispatch reader (reference S1+S4, ``lambda.py:58-79``).

    The reference dispatches only ``.csv``/``.json`` and raises for
    anything else (``lambda.py:73-74``); the guard is preserved, but
    the supported set is widened to every Spark-native columnar/text
    format a lake migration actually encounters: parquet, ORC,
    tab-separated CSV, and raw line-per-row text.
    """
    lower = path.lower()
    if lower.endswith(".csv"):
        return read_csv(spark, path, schema, infer)
    if lower.endswith((".tsv", ".tab")):
        return read_csv(spark, path, schema, infer, sep="\t")
    if lower.endswith(".json"):
        return read_json(spark, path, schema, infer)
    # Columnar formats HONOR a caller-provided schema too (by-name
    # projection + type enforcement): silently ignoring it would hand
    # back differently-typed columns than the schema promised — the
    # same silent-divergence the .txt branch rejects loudly.
    if lower.endswith(".parquet"):
        reader = spark.read
        if schema is not None and not infer:
            reader = reader.schema(schema)
        return reader.parquet(path)
    if lower.endswith(".orc"):
        reader = spark.read
        if schema is not None and not infer:
            reader = reader.schema(schema)
        return reader.orc(path)
    if lower.endswith(".txt"):
        # one row per line, single `value` string column (Spark-native
        # text source).  A caller-provided schema cannot be honored —
        # reject it loudly (same philosophy as the unsupported-suffix
        # guard) rather than silently returning a differently-shaped
        # frame the caller's schema promised otherwise.
        if schema is not None:
            raise UnsupportedFormatError(
                "read_any: .txt files always yield a single `value` "
                "string column; a caller-provided schema cannot apply "
                f"({path})"
            )
        return spark.read.text(path)
    raise UnsupportedFormatError(f"Unsupported file format: {path}")


def read_sales(
    spark: SparkSession, path: str, infer: bool = False
) -> DataFrame:
    """Read a raw sales batch with the explicit 14-column ingest schema."""
    return read_any(spark, path, sales_ingest_schema(), infer)


def _normalize_ntz(df: DataFrame) -> DataFrame:
    """Parquet timestamps written without a timezone annotation surface as
    TIMESTAMP_NTZ under Spark's default NTZ inference.  Event-time
    watermarks reject NTZ, and the rest of the engine (and the round-1
    test corpus) speaks TIMESTAMP; with the session pinned to UTC the
    cast is value-identical, so normalize at the single load point."""
    ntz = [f.name for f in df.schema.fields if f.dataType.typeName() == "timestamp_ntz"]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one star-schema test table from a scale-factor directory."""
    if name == "events":
        return read_events(spark, sf_dir)
    return _normalize_ntz(
        spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    )


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events table reader.

    The test ``events.parquet`` stores ``ts`` as parquet
    ``TIMESTAMP(NANOS)`` which Spark's TimestampType (µs) refuses to read
    directly.  Read nanos as long (legacy conf) and convert with integer
    division — ``ts div 1000`` — because a double division would lose
    precision above 2^53 ns (~1970+104 days).  Truncation matches
    DuckDB's ``CAST(ts_ns AS TIMESTAMP)`` semantics used by the oracles.

    The ``nanosAsLong`` conf set here is deliberately ONE-WAY for the
    session (``session.get_spark`` pins it at build time too): the
    returned frame is lazy, so the conf must still be set whenever the
    scan actually executes — a set-and-restore would make collection
    fail or change type depending on WHEN the caller acts on the
    frame.  Session-wide it means any later raw parquet read of a
    NANOS column in this session yields bigint nanos rather than
    Spark's unsupported-type error; route reads through
    :func:`read_table`, which normalizes that deterministically.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ts_type = dict(df.dtypes).get("ts")
    if ts_type in ("bigint", "long"):
        df = df.withColumn(
            "ts", F.expr("timestamp_micros(ts div 1000)")
        )
    return _normalize_ntz(df)


def star_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every star-schema table present under ``sf_dir`` —
    through :func:`read_table`, NOT raw ``spark.read.parquet``: the
    events table needs the TIMESTAMP(NANOS) handling and every table
    the NTZ normalization, and a raw read would give the same table a
    session-order-dependent schema (fails before read_events ever ran,
    raw bigint nanos after)."""
    out: dict[str, DataFrame] = {}
    for name in STAR_TABLE_NAMES:
        p = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(p):
            out[name] = read_table(spark, sf_dir, name)
    return out
