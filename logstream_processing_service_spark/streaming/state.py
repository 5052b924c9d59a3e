"""Stateful semantic grouping (SURVEY M3/T4): the reference's evolving
nearest-centroid store (src/ml/vector_engine.py:21-45 — argmin Minkowski
p=1.5, mint a new group beyond threshold 0.35) hosted in Structured
Streaming keyed state via ``applyInPandasWithState``.

Semantics note (SURVEY §7 'hard parts'): the reference's centroid minting is
order-dependent and global. Keyed state shards the store by a partition key
(here ``event_type``/app); within a key, rows are processed in a stable
order (sorted by id) so re-runs are deterministic. A truly global store
would serialize the whole stream through one task — the sharded form is the
scalable re-expression, and the one the batch oracle mirrors per key.
"""

from __future__ import annotations

from collections.abc import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

THRESHOLD = 0.35  # reference: src/ml/vector_engine.py:8
P = 1.5  # Minkowski order: src/ml/vector_engine.py:13-19

OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("row_id", LongType()),
        StructField("group_id", LongType()),
        StructField("dist", DoubleType()),
    ]
)

# state: flattened centroid matrix + the ids they were minted from
STATE_SCHEMA = StructType(
    [
        StructField("ids", StringType()),      # comma-joined group ids
        StructField("flat", StringType()),     # comma-joined row-major floats
        StructField("dim", LongType()),
    ]
)


def _minkowski(a: np.ndarray, b: np.ndarray, p: float = P) -> float:
    return float(np.power(np.power(np.abs(a - b), p).sum(), 1.0 / p))


def semantic_group_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
):
    """Per-key online centroid assignment. Rows assigned to the nearest
    stored centroid if within THRESHOLD, else mint a new group seeded at the
    row's vector (reference: vector_engine.py:29-43)."""
    if state.exists:
        ids_s, flat_s, dim = state.get
        ids = [int(x) for x in ids_s.split(",")] if ids_s else []
        cents = (
            np.fromstring(flat_s, sep=",").reshape(len(ids), int(dim))
            if ids
            else np.zeros((0, 0))
        )
    else:
        ids, cents, dim = [], None, 0

    out_rows = []
    for pdf in pdfs:
        pdf = pdf.sort_values("row_id")  # stable order => deterministic state
        for _, row in pdf.iterrows():
            vec = np.asarray(row["embedding"], dtype=np.float64)
            if dim == 0:
                dim = len(vec)
                cents = np.zeros((0, dim))
            if len(ids):
                d = np.power(np.power(np.abs(cents - vec), P).sum(axis=1), 1 / P)
                j = int(np.argmin(d))
                best = float(d[j])
            else:
                j, best = -1, float("inf")
            if best < THRESHOLD:
                gid = ids[j]
            else:
                gid = int(row["row_id"])  # mint: sem_grp_{log_id} analogue
                ids.append(gid)
                cents = np.vstack([cents, vec])
                best = 0.0
            out_rows.append((str(key[0]), int(row["row_id"]), gid, best))

    state.update(
        (
            ",".join(str(i) for i in ids),
            ",".join(f"{x:.17g}" for x in np.asarray(cents).ravel()),
            int(dim),
        )
    )
    yield pd.DataFrame(out_rows, columns=["key", "row_id", "group_id", "dist"])


def semantic_grouping_stream(embedded: DataFrame, key_col: str = "event_type") -> DataFrame:
    """Wire the stateful grouping over a streaming DataFrame with columns
    (key_col, row_id, embedding array<float>)."""
    return (
        embedded.groupBy(key_col)
        .applyInPandasWithState(
            semantic_group_fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Count-based windows (SURVEY T5 / §4 'needs custom work' #3): Spark's
# streaming windows are time-based; the reference's 100-log virtual batches
# are COUNT-based. True arrival-count windows need keyed state.
# ---------------------------------------------------------------------------

COUNT_WINDOW_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("window_idx", LongType()),
        StructField("n_events", LongType()),
        StructField("first_id", LongType()),
        StructField("last_id", LongType()),
    ]
)

COUNT_STATE_SCHEMA = StructType(
    [
        StructField("n_total", LongType()),   # events consumed so far
        StructField("buf_n", LongType()),     # events in the open window
        StructField("buf_first", LongType()),
    ]
)


def count_window_fn(window_size: int):
    """Build the stateful per-key function: emit one row per COMPLETED
    window of ``window_size`` events; the open remainder stays in state
    across micro-batches (exactly the reference's 100-log batches,
    scripts/run_training_batch.py:218, but arrival-driven)."""

    def fn(key: tuple, pdfs, state: GroupState):
        import pandas as pd

        n_total, buf_n, buf_first = state.get if state.exists else (0, 0, -1)
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values("row_id")  # deterministic within a batch
            for rid in pdf["row_id"]:
                rid = int(rid)
                if buf_n == 0:
                    buf_first = rid
                buf_n += 1
                n_total += 1
                if buf_n == window_size:
                    out.append(
                        (str(key[0]), (n_total - 1) // window_size, buf_n, buf_first, rid)
                    )
                    buf_n, buf_first = 0, -1
        state.update((n_total, buf_n, buf_first))
        yield pd.DataFrame(
            out, columns=["key", "window_idx", "n_events", "first_id", "last_id"]
        )

    return fn


def count_window_stream(
    df: DataFrame, key_col: str = "event_type", window_size: int = 100
) -> DataFrame:
    """Arrival-count tumbling windows per key over a stream with columns
    (key_col, row_id)."""
    return df.groupBy(key_col).applyInPandasWithState(
        count_window_fn(window_size),
        outputStructType=COUNT_WINDOW_SCHEMA,
        stateStructType=COUNT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
