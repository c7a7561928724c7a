"""Custom stateful streaming operators (SURVEY §2.C C8 — the reference's
architectural heart: updateStateByKey-style running state across batches).

Implemented with ``applyInPandasWithState``: per-key state lives in the
state store (checkpointed, exactly-once), Python sees Arrow batches of the
key's rows per trigger. Two operators:

- running per-key counters (the reference's word-count-across-batches);
- running per-key Count-Min Sketch, kept as serialized table bytes in
  state and merged batch-by-batch (the reference's CMS-over-stream), with
  the numpy CMS from functions/cms.py.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

_COUNT_OUT = StructType(
    [
        StructField("key", StringType()),
        StructField("batch_events", LongType()),
        StructField("running_total", LongType()),
    ]
)
_COUNT_STATE = StructType([StructField("total", LongType())])


def running_counts(stream_df: DataFrame, key_col: str) -> DataFrame:
    """Running event count per key across micro-batches.

    Emits (key, batch_events, running_total) per key per batch; the final
    running_total per key equals the batch groupBy().count() — which is the
    correctness oracle.
    """

    def update(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        batch_n = 0
        for pdf in pdfs:
            batch_n += len(pdf)
        (total,) = state.get if state.exists else (0,)
        total += batch_n
        state.update((total,))
        yield pd.DataFrame(
            {"key": [str(key[0])], "batch_events": [batch_n], "running_total": [total]}
        )

    return (
        stream_df.groupBy(key_col)
        .applyInPandasWithState(
            update, _COUNT_OUT, _COUNT_STATE, "append", GroupStateTimeout.NoTimeout
        )
    )
