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


# --- transformWithStateInPandas (Spark 4 stateful API) -------------------

try:  # Spark >= 4.0 only
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RecordHighProcessor(StatefulProcessor):
        """Emit events that set a new per-key running maximum.

        The change-detection shape (new high-water marks, threshold
        crossings) that pure aggregation can't express — the output is
        the *triggering rows*, not an aggregate. State is one double per
        key. Rows are processed in (ts, event_id) order within each
        micro-batch so emission is deterministic regardless of shuffle
        arrival order.

        Uses the Spark 4 ``transformWithStateInPandas`` API (typed state
        via StatefulProcessorHandle) rather than the older
        ``applyInPandasWithState`` (see :func:`running_user_stats` for
        that surface — the engine exposes both).
        """

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._max = handle.getValueState("maxv", "v double")

        def handleInputRows(self, key, rows, timer_values):
            pdfs = [pdf for pdf in rows if len(pdf)]
            if not pdfs:
                return
            pdf = pd.concat(pdfs).sort_values(["ts", "event_id"])
            cur = self._max.get()[0] if self._max.exists() else None
            keep = []
            for val in pdf["value"]:
                is_record = cur is None or val > cur
                keep.append(is_record)
                if is_record:
                    cur = val
            self._max.update((float(cur),))
            out = pdf.loc[keep, ["user_id", "event_id", "value"]]
            if len(out):
                yield out

        def close(self) -> None:
            pass

except ImportError:  # pragma: no cover - Spark 3.x
    RecordHighProcessor = None  # type: ignore[assignment]


def _tws_available() -> bool:
    """transformWithState needs PySpark >= 4.0 AND protobuf (its state
    protocol is protobuf-based; the dependency is optional in pyspark)."""
    if RecordHighProcessor is None:
        return False
    try:
        from google.protobuf import descriptor  # noqa: F401
        return True
    except ImportError:
        return False


def _record_fold(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """applyInPandasWithState twin of RecordHighProcessor."""
    frames = [pdf for pdf in pdfs if len(pdf)]
    if not frames:
        return
    pdf = pd.concat(frames).sort_values(["ts", "event_id"])
    cur = state.get[0] if state.exists else None
    keep = []
    for val in pdf["value"]:
        is_record = cur is None or val > cur
        keep.append(is_record)
        if is_record:
            cur = val
    state.update((float(cur),))
    out = pdf.loc[keep, ["user_id", "event_id", "value"]]
    if len(out):
        yield out


def record_high_events(events: DataFrame) -> DataFrame:
    """Rows whose ``value`` exceeds every prior value for the key.

    ``events`` must carry ``user_id``, ``event_id``, ``ts``, ``value``.

    Prefers the Spark 4 ``transformWithStateInPandas`` API (requires the
    RocksDB state store provider — set by the caller — and the optional
    ``protobuf`` package for its state protocol); falls back to an
    identical-semantics ``applyInPandasWithState`` fold when protobuf is
    absent. Output schema and emitted rows are the same either way.
    """
    if _tws_available():
        return events.groupBy("user_id").transformWithStateInPandas(
            RecordHighProcessor(),
            outputStructType="user_id long, event_id long, value double",
            outputMode="append",
            timeMode="none",
        )
    return events.groupBy("user_id").applyInPandasWithState(
        _record_fold,
        outputStructType="user_id long, event_id long, value double",
        stateStructType="v double",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
