"""Python UDTFs (table functions) — the row-to-rows escape hatch.

The engine's rule is built-ins first (SURVEY §2.9: the reference needs
no UDFs at all, and every hot-path operator here is JVM expressions or
Arrow-batched pandas).  A UDTF is the right tool ONLY for row-to-
variable-rows expansion with genuinely imperative parsing — the case
below is free-form key=value telemetry where the key set is unknown
(so no from_json schema) and values need Python-side cleanup.

Scale notes: UDTFs run row-at-a-time in the Python worker — 10-100×
slower than an exploded JVM expression.  Use them at the EDGE of the
pipeline (parse-once-land-typed), never inside iterative or per-batch
hot paths; once parsed, everything downstream is columnar again.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="key string, value string")
class ParseKeyValue:
    """Explode a free-form ``k=v;k2=v2`` string into (key, value) rows,
    skipping malformed fragments — lazy row-by-row yield, so one huge
    record doesn't materialize a list."""

    def eval(self, s: str):  # noqa: D102 - contract defined by Spark
        for part in (s or "").split(";"):
            if "=" in part:
                k, v = part.split("=", 1)
                k, v = k.strip(), v.strip()
                if k:
                    yield k, v


def register_udtfs(spark) -> None:
    """Register SQL-callable table functions (``SELECT * FROM
    parse_kv('a=1;b=2')``)."""
    spark.udtf.register("parse_kv", ParseKeyValue)
