"""Object-store (S3-semantics) publish path for the txlog ACID layer:
the full protocol must behave identically when the transaction log
lives in a rename-less, link-less conditional-PUT store instead of a
POSIX directory (operators/logstore.py::ObjectStoreLogStore over the
InMemoryObjectStore fake)."""

from __future__ import annotations

import threading

import pytest

from us_flight_delay_data_pipeline_spark.operators.logstore import (
    InMemoryObjectStore, ObjectStoreLogStore)
from us_flight_delay_data_pipeline_spark.operators.txlog import (
    TxConflictError, TxTable)


@pytest.fixture()
def obj_table(spark, tmp_path):
    bucket = InMemoryObjectStore()
    store = ObjectStoreLogStore(bucket, "tables/t1/_txlog")
    t = TxTable(spark, str(tmp_path / "t1"), checkpoint_every=3,
                stats_cols=("k",), log_store=store)
    return t, bucket


def _df(spark, rows):
    return spark.createDataFrame(rows, "k bigint, v string")


def test_object_store_publish_append_overwrite_time_travel(spark, obj_table):
    t, bucket = obj_table
    t.append(_df(spark, [(1, "a"), (2, "b")]))
    t.append(_df(spark, [(3, "c")]))
    t.overwrite(_df(spark, [(9, "z")]))
    # log objects live in the bucket, NOT on the local filesystem
    keys = bucket.list_keys("tables/t1/_txlog/")
    assert any(k.endswith("00000000.json") for k in keys)
    import os
    assert not os.path.exists(os.path.join(t.path, "_txlog")) or \
        not os.listdir(os.path.join(t.path, "_txlog"))
    # snapshot + time travel replay from the bucket
    assert sorted(r.k for r in t.snapshot().collect()) == [9]
    assert sorted(r.k for r in t.snapshot(version=1).collect()) == [1, 2, 3]
    assert [m["op"] for m in t.history()] == [
        "append", "append", "overwrite"]


def test_object_store_checkpoint_and_exactly_once(spark, obj_table):
    t, bucket = obj_table
    for i in range(5):
        t.commit_once(_df(spark, [(i, "x")]), token=f"q/{i}")
    # replayed token: no-op
    assert t.commit_once(_df(spark, [(0, "dup")]), token="q/0") is None
    assert t.latest_version() == 4
    # checkpoint_every=3 → a checkpoint object exists in the bucket
    assert any(k.endswith(".ckpt.json")
               for k in bucket.list_keys("tables/t1/_txlog/"))
    assert sorted(r.k for r in t.snapshot().collect()) == [0, 1, 2, 3, 4]


def test_object_store_merge_and_skipping(spark, obj_table):
    t, bucket = obj_table
    t.append(_df(spark, [(1, "a"), (2, "b")]))
    t.append(_df(spark, [(100, "h"), (200, "i")]))
    t.merge(_df(spark, [(2, "B!"), (300, "new")]), keys=["k"])
    got = {r.k: r.v for r in t.snapshot().collect()}
    assert got == {1: "a", 2: "B!", 100: "h", 200: "i", 300: "new"}
    # data skipping still works: stats rode the bucket manifests
    pruned = t.snapshot(prune=("k", 150, 250))
    assert {r.k for r in pruned.collect()} >= {200}
    assert 1 not in {r.k for r in pruned.collect()}


def test_conditional_put_loses_race_exactly_once(spark, obj_table):
    """Two writers racing for the same version through the bucket:
    the conditional PUT admits exactly one manifest; the loser
    retries at N+1 (no lost update, no duplicate version)."""
    t, bucket = obj_table
    t.append(_df(spark, [(1, "a")]))

    n_threads, errs = 6, []

    def writer(i):
        try:
            t.append(_df(spark, [(10 + i, f"w{i}")]))
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ts = [threading.Thread(target=writer, args=(i,))
          for i in range(n_threads)]
    for th in ts:
        th.start()
    for th in ts:
        th.join()
    assert not errs
    # all six commits landed at distinct consecutive versions
    assert t.latest_version() == n_threads
    assert sorted(r.k for r in t.snapshot().collect()) \
        == [1] + [10 + i for i in range(n_threads)]


def test_exhausted_retries_raise(spark, tmp_path):
    """A store that always reports 'key exists' (pathological
    contention) must surface TxConflictError, not loop forever."""

    class AlwaysTaken(InMemoryObjectStore):
        def put_if_none_match(self, key, content):
            return False

    store = ObjectStoreLogStore(AlwaysTaken(), "t/_txlog")
    t = TxTable(spark, str(tmp_path / "t2"), max_retries=3,
                log_store=store)
    with pytest.raises(TxConflictError):
        t.append(_df(spark, [(1, "a")]))


def test_posix_and_object_store_protocols_agree(spark, tmp_path):
    """Same commit sequence through both stores → identical history
    ops, versions, and snapshot contents (the seam changes WHERE the
    log lives, never WHAT it says)."""
    t_posix = TxTable(spark, str(tmp_path / "p"), stats_cols=("k",))
    t_obj = TxTable(
        spark, str(tmp_path / "o"), stats_cols=("k",),
        log_store=ObjectStoreLogStore(InMemoryObjectStore(), "o/_txlog"))
    for t in (t_posix, t_obj):
        t.append(_df(spark, [(1, "a"), (2, "b")]))
        t.merge(_df(spark, [(2, "B"), (3, "c")]), keys=["k"])
        t.delete_where("k = 1")
    for attr in ("latest_version",):
        assert getattr(t_posix, attr)() == getattr(t_obj, attr)()
    assert [m["op"] for m in t_posix.history()] \
        == [m["op"] for m in t_obj.history()]
    assert sorted((r.k, r.v) for r in t_posix.snapshot().collect()) \
        == sorted((r.k, r.v) for r in t_obj.snapshot().collect())
