"""Custom stateful streaming operator via applyInPandasWithState.

The windowed transforms in transforms.py are Spark built-ins; this is
the OTHER half of the streaming surface — arbitrary per-key state the
engine cannot express as a window, the Structured Streaming equivalent
of the reference's "bring your own Python reduce over a key partition"
extension point (reference w6/docs/design.md:93-101, workerimpl.cc:
112-130), made incremental.

State posture at scale: one fixed-width state row per active key held
in the state store, updated per micro-batch with Arrow-batched
transfer; no state growth with events-per-key.  With event-time
timeouts (GroupStateTimeout.EventTimeTimeout + a watermark) idle keys
would be evicted — kept NoTimeout here because the fixture's key space
is small and the oracle covers all keys.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_cents bigint"
STATE_SCHEMA = "cnt bigint, cents bigint"


def running_totals(stream_df: DataFrame) -> DataFrame:
    """Per-user running (event count, total value in integer cents),
    emitted as an update row per key per micro-batch that touches it.

    Value accumulates in integer cents so the running total is exact
    and batch≡stream comparable regardless of arrival order — summing
    doubles incrementally would drift by fold order.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs: Iterator, state: GroupState) -> Iterator:
        # Defined locally; cloudpickle ships it by value (executors
        # never import this module — see functions/tokenize.py).
        import pandas as pd

        cnt, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            cnt += len(pdf)
            cents += int(pdf["value"].fillna(0.0).mul(100).round().sum())
        state.update((cnt, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [cnt], "total_cents": [cents]}
        )

    return stream_df.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
