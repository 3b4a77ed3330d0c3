"""Custom stateful streaming operators (``applyInPandasWithState``).

The reference is batch-only; this is the engine's arbitrary-state streaming
surface, the shape SURVEY §7 calls out for operators Structured Streaming's
built-in aggregations can't express.

- ``streaming_dedup``: exact online deduplication over a document stream.
  State per content hash = (lowest id seen, copies seen); every microbatch
  emits the updated record for each hash it touched (update semantics).
  At 100 TB/day this is the standard streaming-dedup layout: state is
  hash-partitioned by content digest across executors, each group's state
  is a few bytes, and the RocksDB state store scales it past executor
  memory.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_OUTPUT_SCHEMA = "text_hash string, keep_id long, n_copies long"
DEDUP_STATE_SCHEMA = "keep_id long, n_copies long"


def _dedup_group(
    key: tuple[Any, ...],
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-hash state update: fold this batch's ids into (min id, count)."""
    min_id: int | None = None
    n = 0
    for pdf in batches:
        m = int(pdf["doc_id"].min())
        min_id = m if min_id is None else min(min_id, m)
        n += len(pdf)
    if state.exists:
        prev_id, prev_n = state.get
        min_id = min(min_id, prev_id)
        n += prev_n
    state.update((min_id, n))
    yield pd.DataFrame({"text_hash": [key[0]], "keep_id": [min_id], "n_copies": [n]})


def streaming_dedup(
    stream: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Online exact dedup of a streaming (id, text) DataFrame.

    Returns a streaming DataFrame of (text_hash, keep_id, n_copies) in
    update mode: each microbatch re-emits the current record for every
    content hash it saw.  The batch twin is ``operators.dedup.exact_dedup``
    — on a fully drained stream the final state equals the batch answer.
    """
    keyed = stream.select(
        F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col).alias("doc_id")
    )
    return keyed.groupBy("text_hash").applyInPandasWithState(
        _dedup_group,
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
