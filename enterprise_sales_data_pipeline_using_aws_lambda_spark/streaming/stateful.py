"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY §2.8 extension — the reference has no stateful processing at
all; its only "state" is the keyed upsert table, ``lambda.py:176-181``).

``running_user_totals`` keeps one fixed-size state row per user and
emits that user's updated lifetime totals whenever a micro-batch touches
them (update output mode).  This is the operator shape Spark's built-in
windowed aggregations can't express: unbounded, non-windowed,
per-key running state with custom merge logic.

Scale notes:
- State lives in the executor state store partitioned by the grouping
  key — adding executors shards state linearly; nothing accumulates on
  the driver.
- Per key the state is O(1) (three scalars), so state-store size is
  bounded by |distinct users|, not by event volume.
- Arrow moves each group's batch rows to Python in one block; the
  Python function touches only the group's rows, never the stream.
- An idle-timeout (``GroupStateTimeout``) variant would evict dormant
  keys for unbounded key spaces; kept NoTimeout here because the totals
  are lifetime aggregates.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, n_events long, total_value double, max_value double"
)
STATE_SCHEMA = "n long, total double, mx double"


def _update_user_totals(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total, mx = state.get
    else:
        n, total, mx = 0, 0.0, float("-inf")
    for pdf in pdfs:
        if pdf.empty:
            continue
        # SQL semantics, matching the batch-parity oracle exactly:
        # count(*) counts every row, sum/max skip NULL values (pandas
        # skipna would otherwise silently fold NaN into max and let
        # count and sum disagree about what an event is).  Known
        # divergence: Arrow hands BOTH SQL NULL and a genuine NaN
        # double to pandas as NaN, so a real NaN value (0.0/0.0
        # upstream) is treated as NULL here, where Spark's batch
        # sum/max would propagate/rank it — indistinguishable at this
        # API; keep NaN out of value columns upstream (the engine's
        # own operators never produce it).
        n += len(pdf)
        vals = pdf["value"].dropna().astype("float64")
        if len(vals):
            total += float(vals.sum())
            mx = max(mx, float(vals.max()))
    state.update((n, total, mx))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [round(total, 2)],
            # -inf sentinel = no non-null value seen yet -> SQL max()
            # over zero values is NULL, not -Infinity
            "max_value": [None if mx == float("-inf") else mx],
        }
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user lifetime (count, sum, max) over an event stream, emitted
    in update mode each time a micro-batch touches the user.  Streaming
    only (Spark requires a streaming DataFrame for stateful ops); drain
    a bounded input with ``Trigger.AvailableNow`` to use it batch-style —
    the final emission per key then equals the batch ``groupBy``."""
    return events.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
