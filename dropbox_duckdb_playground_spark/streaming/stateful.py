"""Custom stateful streaming operators (applyInPandasWithState).

The reference is batch-only; its incrementality is snapshot+diff
(SURVEY §2.12). These are the stateful-stream versions of the two
recurring shapes in its workload — keep-first dedup (crawl.py's
keep-first merge C3) and running per-key tallies — expressed as
arbitrary-state operators so the pattern generalizes to any
training-data-pipeline stream (e.g. first-seen URL dedup at ingest).

Scale: state lives in the executor state store partitioned by key
(RocksDB-backed on a real cluster); each micro-batch touches only the
keys present in that batch. Watermark-driven state TTL is exposed via
``ttl`` so unbounded key spaces don't accumulate state forever.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

if TYPE_CHECKING:  # pragma: no cover
    import pandas


def first_seen_dedup(
    events: DataFrame,
    key: str,
    out_schema: str,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Emit only the FIRST row ever seen per key; drop every later
    duplicate. Streaming twin of ``keep_first_merge`` (C3).

    ``out_schema`` must name the columns to keep (key first). With
    ``ttl_ms`` set, a key's seen-marker expires after that idle time
    (processing-time timeout) — bounded state for unbounded keys."""
    from pyspark.sql.types import _parse_datatype_string

    # proper schema parse — naive comma-splitting breaks on types that
    # contain commas themselves (decimal(10,2), struct<...>)
    cols = _parse_datatype_string(out_schema).fieldNames()

    def run(key_tuple, pdfs, state: GroupState):
        if ttl_ms is not None and state.hasTimedOut:
            state.remove()
            return
        first = None
        for pdf in pdfs:
            if first is None and len(pdf):
                first = pdf.iloc[[0]][cols]
        if not state.exists:
            if first is not None:
                state.update((True,))
                if ttl_ms is not None:
                    state.setTimeoutDuration(ttl_ms)
                yield first
        elif ttl_ms is not None:
            # key already seen: refresh the TTL, emit nothing
            state.setTimeoutDuration(ttl_ms)

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy(key).applyInPandasWithState(
        run, out_schema, "seen boolean", "append", timeout
    )


def running_totals(
    events: DataFrame,
    key: str,
    value_col: str = "value",
) -> DataFrame:
    """Cumulative (count, sum) per key across the whole stream — the
    stateful version of a groupBy that a snapshot+diff batch pipeline
    rebuilds from scratch each run."""

    def run(key_tuple, pdfs, state: GroupState):
        import pandas as pd

        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf[value_col].sum())
        state.update((n, s))
        yield pd.DataFrame({key: [key_tuple[0]], "n": [n], "total": [s]})

    return events.groupBy(key).applyInPandasWithState(
        run,
        f"{key} long, n long, total double",
        "n long, total double",
        "update",
        GroupStateTimeout.NoTimeout,
    )
