"""Scalar date functions (reference F1–F3).

All JVM-side built-ins — they stay inside whole-stage codegen; no Python
boundary is crossed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..schema import SALES_DATE_FORMAT


def parse_mdY(col: Column | str, fmt: str = SALES_DATE_FORMAT) -> Column:
    """String ``M/d/yyyy`` → DateType (reference F1, ``lambda.py:107``).

    ``try_to_date``, not ``to_date``: under Spark 4's ANSI-on default a
    single malformed value would otherwise throw and kill the job,
    where this pipeline's posture is null-out-and-quarantine
    (``operators.validate`` gates on the same try_ semantics before
    any serving write, so a null here is never silent downstream)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.try_to_date(c.cast("string"), fmt)


def format_date(col: Column | str, fmt: str = "yyyy-MM-dd") -> Column:
    """Date/timestamp → formatted string (reference F2,
    ``lambda.py:168-169`` restringifies dates for the serving tables)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, fmt)
