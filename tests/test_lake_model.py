"""Model-based randomized test of the lake snapshot semantics: random
append / overwrite / delete / rollback / merge sequences replay against a
trivially-correct in-memory model, then EVERY historical snapshot is
time-travel-read and compared — the whole state space the example-based
lake tests sample pointwise.

Model: a snapshot is the set of live event_ids (ids are unique across the
run, values derive from ids, so set equality is full-row equality)."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from bytewax_iceberg_connector_spark.config import IcebergSinkConfig
from bytewax_iceberg_connector_spark.operators.sink import LakeSink

# op grammar: each op consumes the next fresh id block where it needs rows
_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.integers(1, 4)),
        st.tuples(st.just("overwrite"), st.integers(1, 4)),
        st.tuples(st.just("delete_below"), st.integers(0, 20)),
        # rollback target picked as an index fraction into history
        st.tuples(st.just("rollback"), st.integers(0, 100)),
        # merge: upsert a block that half-overlaps the live set
        st.tuples(st.just("merge"), st.integers(1, 3)),
    ),
    min_size=1,
    max_size=5,
)


def _rows(spark, ids):
    return spark.createDataFrame(
        [
            Row(event_id=i, ts=dt.datetime(2024, 1, 1 + i % 5, 9), v=float(i))
            for i in ids
        ]
    )


@given(ops=_OPS)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_lake_matches_in_memory_model(spark, tmp_path_factory, ops):
    tmp = tmp_path_factory.mktemp("lake_model")
    cfg = IcebergSinkConfig(
        table_name="db.model_events",
        warehouse_path=str(tmp),
        num_partitions=2,
        partition_spec=[("ts", "day")],
    )
    sink = LakeSink(spark, cfg)

    next_id = 0

    def fresh(n):
        nonlocal next_id
        ids = list(range(next_id, next_id + n))
        next_id += n
        return ids

    live: set[int] = set()
    history: list[set[int]] = []  # history[i] = live set AFTER snapshot i+1

    # ensure the table exists (rollback/delete before any commit is a
    # client error, not a semantics question)
    ids = fresh(2)
    sink.append(_rows(spark, ids))
    live |= set(ids)
    history.append(set(live))

    for op, arg in ops:
        if op == "append":
            ids = fresh(arg)
            sink.append(_rows(spark, ids))
            live |= set(ids)
        elif op == "overwrite":
            ids = fresh(arg)
            sink.overwrite(_rows(spark, ids))
            live = set(ids)
        elif op == "delete_below":
            sink.delete(f"event_id < {arg}")
            live = {i for i in live if not i < arg}
        elif op == "rollback":
            target = (arg % len(history)) + 1  # snapshot ids are 1-based
            sink.rollback(target)
            live = set(history[target - 1])
        elif op == "merge":
            # half old ids (value update), half fresh (insert)
            old = sorted(live)[: max(arg // 2, 0)]
            ids = old + fresh(arg - len(old))
            sink.merge(_rows(spark, ids), keys=["event_id"])
            live |= set(ids)
        history.append(set(live))
        got = {r.event_id for r in sink.read().select("event_id").collect()}
        assert got == live, (op, arg, got, live)

    # every historical snapshot must still read back exactly
    for snap_id, want in enumerate(history, start=1):
        got = {
            r.event_id
            for r in sink.read(as_of=snap_id).select("event_id").collect()
        }
        assert got == want, (snap_id, got, want)
