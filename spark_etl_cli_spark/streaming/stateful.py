"""Custom stateful streaming operators via ``applyInPandasWithState``.

For stateful logic Spark's built-in windowed/session aggregations can't
express (per-key accumulators with arbitrary merge rules, custom
eviction), Structured Streaming offers arbitrary state: the operator
below keeps one state row per key and folds every micro-batch's rows
into it, emitting the updated aggregate per batch ("update" mode).

Under ``availableNow`` on a static directory all data arrives in one
epoch, so the emitted aggregates equal a batch groupBy — which is what
the oracle-checked query (plans/streamops.py q54) asserts. In a live
stream the same operator maintains the running values indefinitely,
with state bounded by the key cardinality.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, n_events long, first_epoch long, last_epoch long, n_types long"
)
STATE_SCHEMA = "n long, first_us long, last_us long, types string"


def _fold(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n, first_us, last_us, types_csv = state.get
        types = set(types_csv.split("\x1f")) if types_csv else set()
    else:
        n, first_us, last_us, types = 0, None, None, set()
    for pdf in pdfs:
        n += len(pdf)
        us = (pdf["ts"].astype("int64") // 1000).tolist()  # ns -> us
        lo, hi = min(us), max(us)
        first_us = lo if first_us is None else min(first_us, lo)
        last_us = hi if last_us is None else max(last_us, hi)
        types.update(pdf["event_type"].tolist())
    state.update((n, int(first_us), int(last_us), "\x1f".join(sorted(types))))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "first_epoch": [first_us // 1_000_000],
            "last_epoch": [last_us // 1_000_000],
            "n_types": [len(types)],
        }
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running (count, first/last event time, distinct types).

    ``events`` must carry ``user_id``, ``ts`` (timestamp), ``event_type``.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _fold,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
