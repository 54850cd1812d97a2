"""Custom stateful streaming operator: first-seen deduplication.

The "operator Spark lacks" pattern (``applyInPandasWithState``): keep
one bit of state per key and emit each key's first-ever row, across
micro-batches. This is streaming exact-dedup for a training-data feed —
the batch twin is ``operators/text_dedup.exact_dedup``.

Spark's built-in ``dropDuplicates`` on a stream keeps *unbounded* state
unless watermarked on event time; this operator shows the explicit
version with timeout-based eviction under our control.

Scale notes: state lives in the executor state store, partitioned by
the grouping key — no driver involvement, horizontal scale with
executors. Arrow-batched state UDF (not row-at-a-time). Use a
processing-time timeout (set ``state_ttl_ms``) to bound the store when
keys are unbounded.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE_SCHEMA = T.StructType([T.StructField("seen", T.BooleanType())])


def first_seen_dedup(
    keyed: DataFrame,
    key_col: str,
    output_schema: T.StructType,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Emit the first row ever observed per ``key_col`` on a stream.

    ``keyed`` must be a *streaming* DataFrame whose columns match
    ``output_schema``. Within a micro-batch the earliest row (by
    arrival order in the batch) wins; across batches the state bit
    suppresses repeats. ``state_ttl_ms`` sets a processing-time TTL
    after which a key may be emitted again (bounded state).
    """

    def dedup_group(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            return
        for pdf in pdfs:
            if len(pdf):
                state.update((True,))
                if state_ttl_ms is not None:
                    state.setTimeoutDuration(state_ttl_ms)
                yield pdf.head(1)
                return

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return keyed.groupBy(key_col).applyInPandasWithState(
        dedup_group,
        outputStructType=output_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


def watermarked_dedup(
    stream: DataFrame,
    key_cols: list[str],
    event_time_col: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming dedup with BOUNDED state via the built-in
    ``dropDuplicatesWithinWatermark``: a repeat of the same key is
    suppressed while it arrives within the watermark delay of the
    first occurrence; state for a key is evicted once the watermark
    passes it, so the store never grows with the full key history —
    the built-in complement to ``first_seen_dedup`` (which holds a
    bit per key forever unless given a TTL).

    This is the right default for streaming ingest dedup where
    duplicates come from at-least-once delivery (retries land close
    to the original); use ``first_seen_dedup`` when dedup must span
    arbitrary time gaps.
    """
    return stream.withWatermark(
        event_time_col, watermark
    ).dropDuplicatesWithinWatermark(key_cols)
