"""Custom stateful streaming operators via applyInPandasWithState — the
escape hatch for aggregations Structured Streaming's built-ins can't
express (the reference's closest analogue is the mutable metrics registry
fed by the consumer loop, core.clj:31-34).

State design for scale: state is per-KEY (user), a few scalars — the
smallest possible footprint; it lives in the state store partitioned by the
groupBy key, so throughput scales with executors. A timeout policy would
evict idle users in production (NoTimeout here keeps tests deterministic).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_user_totals(sdf: DataFrame) -> DataFrame:
    """Running per-user (event count, value total) maintained in group
    state across micro-batches; each batch emits the updated totals for
    the users it touched (update semantics — the upsert-shaped output the
    reference's metrics endpoint approximates).

    OPTIMIZATION_r15 (guide §4.1): applyInPandasWithState is opaque to
    Catalyst, so every input column rides the user_id shuffle AND the
    Arrow boundary into the Python worker — but `update` reads only
    `value` (and the group key). The explicit projection below drops the
    payload columns (`props`, `event_type`, `ts`, `event_id` on the
    events stream) before the exchange; interleaved A/B on the sf0.1
    drain: 2.24 → 1.45 s min (output rows identical — the state math
    never touched the dropped columns)."""

    sdf = sdf.select("user_id", "value")

    def update(
        key: Tuple[int], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n": [n], "total": [round(total, 2)]}
        )

    return sdf.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n long, total double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_user_totals_tws(sdf: DataFrame) -> DataFrame:
    """`transformWithStateInPandas` twin of running_user_totals — the
    Spark 4 arbitrary-stateful API (typed value state via a
    StatefulProcessor, timer support, RocksDB-backed). Same semantics,
    same per-key scalar state footprint; new operators should prefer this
    surface (applyInPandasWithState is the 3.x-compatible path).

    Requires the RocksDB state-store provider
    (`spark.sql.streaming.stateStore.providerClass` →
    RocksDBStateStoreProvider) — transformWithState rejects the default
    HDFS-backed provider.

    Same guide-§4.1 projection as running_user_totals: only the group
    key and `value` cross the shuffle and the Arrow boundary."""
    sdf = sdf.select("user_id", "value")
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", "n long, total double")

        def handleInputRows(self, key, rows, timerValues):
            if self._totals.exists():
                n, total = self._totals.get()
            else:
                n, total = 0, 0.0
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._totals.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n": [n], "total": [round(total, 2)]}
            )

        def close(self) -> None:
            pass

    return sdf.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType="user_id long, n long, total double",
        outputMode="Update",
        timeMode="None",
    )
