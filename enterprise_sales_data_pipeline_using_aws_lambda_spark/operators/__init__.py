from .agg import group_aggregate, sales_summary
from .dedup import dedup_exact, dedup_keep_last
from .upsert import upsert_keep_last
from .validate import ValidationResult, validate_batch, validate_rows

__all__ = [
    "ValidationResult",
    "validate_batch",
    "validate_rows",
    "dedup_exact",
    "dedup_keep_last",
    "upsert_keep_last",
    "group_aggregate",
    "sales_summary",
]
