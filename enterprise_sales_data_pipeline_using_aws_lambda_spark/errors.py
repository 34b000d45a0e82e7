"""Shared exception-classification helpers.

One definition of "this table genuinely does not exist yet", used by
every first-batch/first-write fallback in the package.  Each caller
previously hand-rolled the narrowing — two error-class probes and two
substring matches drifting independently — and the substring form
over-matched any AnalysisException whose MESSAGE merely contained the
tokens (a quoted path, a nested cause), silently treating a real
failure as an empty table.
"""

from __future__ import annotations

#: The ONLY error classes that mean "nothing was ever written here":
#: a missing path, or a directory holding no parquet footers (e.g. a
#: bookkeeping-only directory).  Anything else — corrupt footers,
#: permissions, conflicting structures, a table mid-rename — must
#: propagate: the callers' fallback paths would otherwise overwrite or
#: ignore real data.
_MISSING_CONDITIONS = ("PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA")


def table_error_condition(exc: Exception) -> str:
    """The Spark error class of an AnalysisException, portably:
    ``getCondition`` arrived in Spark 4.0; on the 3.5 floor
    (pyproject) fall back to ``getErrorClass``.  Empty string when the
    exception carries no class."""
    probe = getattr(exc, "getCondition", None) or getattr(
        exc, "getErrorClass", None
    )
    return (probe() if probe else None) or ""


def is_missing_or_empty_table(exc: Exception) -> bool:
    """True iff ``exc`` is the genuinely-first-write case: the path
    does not exist, or exists with no readable footers.  Matched by
    ERROR CLASS, never by message substring."""
    return table_error_condition(exc) in _MISSING_CONDITIONS
