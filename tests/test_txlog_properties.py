"""Model-based property test for the transaction log: random commit
sequences (append / overwrite / delete / merge / partition-overwrite)
are applied both to a TxTable and to a pure-Python DIR-LEVEL model
(the log's own granularity: partition overwrite removes tagged dirs,
delete/merge rewrite touched dirs into an untagged combined dir), and
the expected state is recorded AFTER EVERY VERSION — at the end,
every historical snapshot must equal its model state, so a single
mis-replayed add/remove anywhere in the chain fails, not just the
final state.

Bounded for Spark-per-op cost: few examples, short sequences, tiny
frames."""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from us_flight_delay_data_pipeline_spark.operators.txlog import TxTable

KEYS = st.integers(min_value=0, max_value=9)
ROWS = st.lists(
    st.tuples(KEYS, st.sampled_from("abc")), min_size=1, max_size=4,
    unique_by=lambda r: r[0])

OPS = st.lists(
    st.one_of(
        st.tuples(st.just("append"), ROWS),
        st.tuples(st.just("overwrite"), ROWS),
        st.tuples(st.just("delete"), KEYS),
        st.tuples(st.just("merge"), ROWS),
        st.tuples(st.just("opart"), ROWS),
    ),
    min_size=1, max_size=5)


def _apply_model(dirs: list, op: str, arg) -> list:
    """dirs: list of {"rows": [(k, v)], "tag": frozenset | None} —
    the log's own dir granularity."""
    dirs = [dict(d) for d in dirs]
    if op == "append":
        return dirs + [{"rows": list(arg), "tag": None}]
    if op == "overwrite":
        return [{"rows": list(arg), "tag": None}]
    if op == "opart":
        parities = frozenset(k % 2 for k, _ in arg)
        kept = [d for d in dirs
                if not (d["tag"] and d["tag"] & parities)]
        return kept + [{"rows": list(arg), "tag": parities}]
    if op == "delete":
        ti = [i for i, d in enumerate(dirs)
              if any(k == arg for k, _ in d["rows"])]
        kept = [d for i, d in enumerate(dirs) if i not in ti]
        survivors = [(k, v) for i in ti
                     for k, v in dirs[i]["rows"] if k != arg]
        return kept + ([{"rows": survivors, "tag": None}] if ti else [])
    if op == "merge":
        keys = {k for k, _ in arg}
        ti = [i for i, d in enumerate(dirs)
              if any(k in keys for k, _ in d["rows"])]
        kept = [d for i, d in enumerate(dirs) if i not in ti]
        survivors = [(k, v) for i in ti
                     for k, v in dirs[i]["rows"] if k not in keys]
        out = kept
        if ti:
            out = out + [{"rows": survivors, "tag": None}]
        return out + [{"rows": list(arg), "tag": None}]
    raise AssertionError(op)


def _flatten(dirs: list) -> dict:
    out: dict = {}
    for d in dirs:
        for k, v in d["rows"]:
            out.setdefault(k, []).append(v)
    return {k: sorted(vs) for k, vs in out.items() if vs}


@settings(max_examples=6, deadline=None,
          suppress_health_check=list(HealthCheck))
@pytest.mark.slow  # fast-profile exclusion (see pytest.ini)
@given(ops=OPS)
def test_random_commit_sequences_match_model(spark, tmp_path_factory, ops):
    path = str(tmp_path_factory.mktemp("txprop"))
    t = TxTable(spark, path, checkpoint_every=3, stats_cols=("k",))

    def df(rows):
        return spark.createDataFrame(list(rows), "k int, v string")

    model_history = []
    dirs: list = []
    for op, arg in ops:
        if op == "append":
            t.append(df(arg))
        elif op == "overwrite":
            t.overwrite(df(arg))
        elif op == "delete":
            t.delete_where(f"k = {arg}")
        elif op == "merge":
            t.merge(df(arg), keys=["k"])
        elif op == "opart":
            t.overwrite_partitions(
                df(arg), "parity", sorted({k % 2 for k, _ in arg}))
        dirs = _apply_model(dirs, op, arg)
        model_history.append(dirs)

    assert t.latest_version() == len(ops) - 1
    for v, expected in enumerate(model_history):
        got: dict = {}
        for r in t.snapshot(version=v).collect():
            got.setdefault(r.k, []).append(r.v)
        assert {k: sorted(vs) for k, vs in got.items()} == _flatten(expected), \
            f"version {v} mismatch after ops {ops[:v + 1]}"
