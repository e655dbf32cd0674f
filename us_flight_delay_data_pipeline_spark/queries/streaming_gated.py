"""Structured Streaming queries UNDER the DuckDB oracle gate.

The streaming layer (SURVEY.md §2.10 T1-T5) was previously verified
only by pytest equivalence tests; these queries run REAL streaming
jobs inside the driver's differential harness: a file-source
``readStream`` over the same parquet the oracle reads, a stateful
transformation, ``trigger(availableNow=True)`` (T2) so the stream
drains the source and terminates, a memory sink, and the sink table
returned as the query result. A wrong watermark/window/state
semantics or a stream/batch type skew (the events ``ts`` physical-
type normalization, sources/registry.py::normalize_event_ts) breaks
the value hash exactly like any relational query.

availableNow processes the source in potentially many micro-batches,
so these also pin cross-batch state correctness (window accumulation,
dedup state) — not just single-batch plumbing. Each run uses a fresh
memory-sink name + temp checkpoint: repeated driver/bench runs are
independent and deterministic.

At 100 TB the same plans run unbounded: swap the trigger for a
processing-time one, the memory sink for the transaction-log
``commit_once`` sink (operators/txlog.py), and complete mode for the
watermark+append pair (the funnel and matview modules show both).
"""

from __future__ import annotations

import contextlib
import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import register
from ..sources.registry import normalize_event_ts

_OSUM = ("CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)"
         " AS total_value")


def _stream_source(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """readStream over the same parquet table the batch scan and the
    DuckDB oracle read (schema taken from a batch probe — file streams
    require an explicit schema).

    Handles BOTH table layouts: ``{table}.parquet`` as a single file
    (driver testdata) and as a directory of part files (standard Spark
    writer output, the scale copies, any production dataset). The
    single-file case needs a pathGlobFilter on the parent dir because
    the file stream source monitors directories; pointing the monitor
    at the table directory covers the multi-file case. Without the
    directory branch the glob matched nothing and every gated stream
    silently drained ZERO rows on directory-layout tables.
    """
    path = f"{sf_dir}/{table}.parquet"
    raw_schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(raw_schema)
    if os.path.isdir(path):
        src = reader.option("pathGlobFilter", "*.parquet").parquet(path)
    else:
        src = reader.option("pathGlobFilter", f"{table}.parquet") \
                    .parquet(sf_dir)
    return normalize_event_ts(src)


@contextlib.contextmanager
def _state_sized_shuffle(spark: SparkSession):
    """Scope ``spark.sql.shuffle.partitions`` to the state volume for
    the duration of a stateful drain. Each state-store partition pays
    per-batch instantiation/commit overhead, so the count should track
    state VOLUME, not core count — at the bench SFs 32 stores are pure
    overhead (measured 8.0s -> 4.3s on the attribution join; 2.32s ->
    1.58s on session windows; 1.13s -> 0.78s on streaming dedup with
    8). ``SPARK_GRAFT_STATE_PARTS`` overrides for deployments with
    real state volume (the count is pinned at the first checkpoint, so
    size it once for peak state). Restored in finally; the harness is
    single-threaded — a concurrent caller in the same session should
    run under spark.newSession() to scope the override.
    """
    raw = os.environ.get("SPARK_GRAFT_STATE_PARTS", "8")
    try:
        parts = int(raw)
    except ValueError:
        raise ValueError(
            f"SPARK_GRAFT_STATE_PARTS must be a positive integer, "
            f"got {raw!r}") from None
    if parts <= 0:
        raise ValueError(
            f"SPARK_GRAFT_STATE_PARTS must be a positive integer, "
            f"got {raw!r}")
    conf = spark.conf
    old = conf.get("spark.sql.shuffle.partitions")
    conf.set("spark.sql.shuffle.partitions", parts)
    try:
        yield
    finally:
        conf.set("spark.sql.shuffle.partitions", old)


def _drain_to_memory(df: DataFrame, output_mode: str) -> DataFrame:
    import shutil
    name = f"sg_gated_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix=f"{name}_ckpt_")
    q = (df.writeStream.format("memory").queryName(name)
         .outputMode(output_mode)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    try:
        q.awaitTermination()
    finally:
        # single-use drain: the checkpoint has no replay value and
        # repeated bench/driver runs would otherwise litter /tmp
        shutil.rmtree(ckpt, ignore_errors=True)
    return df.sparkSession.table(name)


@register(
    "stream_hourly_kpis_gated",
    f"""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           COUNT(*) AS n_events, {_OSUM}
    FROM events GROUP BY 1, 2
    """,
    doc="T1+T2+T4 under the oracle gate: a REAL streaming job — "
        "file-source readStream over events.parquet, event-time "
        "tumbling 1-hour window aggregate, availableNow trigger, "
        "memory sink in complete mode — whose drained result must "
        "value-hash-match the batch SQL over the same file. Complete "
        "mode keeps every window in the state store across "
        "micro-batches, so this pins cross-batch window accumulation "
        "and the stream-side ts normalization, not just plumbing.",
)
def stream_hourly_kpis_gated(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = _stream_source(spark, sf_dir, "events")
    agg = (src.groupBy(F.window("ts", "1 hour"), "event_type")
              .agg(F.count("*").alias("n_events"),
                   F.sum(F.col("value").cast("decimal(38,6)"))
                    .cast("double").alias("total_value")))
    with _state_sized_shuffle(spark):
        out = _drain_to_memory(agg, "complete")
    return out.select(F.col("window.start").alias("window_start"),
                      "event_type", "n_events", "total_value")


@register(
    "stream_dedup_gated",
    """
    SELECT lang, COUNT(DISTINCT md5(text)) AS n_unique_docs
    FROM documents GROUP BY lang
    """,
    doc="T5 stateful streaming dedup under the oracle gate: "
        "dropDuplicates on md5(text) inside a streaming query (the "
        "state-store dedup operator), drained with availableNow into "
        "a memory sink, then reduced to per-lang unique counts — "
        "which must equal the batch COUNT(DISTINCT). Which physical "
        "row survives depends on arrival order, so the gated output "
        "is the order-independent projection; the state machine "
        "itself (hash set across micro-batches) is what the count "
        "pins. The 100 TB variant bounds state with a watermark or "
        "swaps in the persisted seen-hash set of streaming/funnel.py.",
)
def stream_dedup_gated(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = _stream_source(spark, sf_dir, "documents")
    # dedup key includes lang: the oracle is a PER-LANG distinct
    # count, and the same text can appear under two languages (first
    # occurs at sf0.1 — caught by the scale-up differential; a global
    # dropDuplicates(h) credits only one lang for a cross-lang dup)
    deduped = (src.withColumn("h", F.md5(F.col("text").cast("binary")))
                  .select("lang", "h")
                  .dropDuplicates(["lang", "h"]))
    with _state_sized_shuffle(spark):
        out = _drain_to_memory(deduped, "append")
    return (out.groupBy("lang")
               .agg(F.count("*").alias("n_unique_docs")))


def _session_gated_oracle() -> str:
    from .sessions_and_ann import _SESSION_ORACLE, SESSION_GAP_MIN
    return f"""
    WITH base AS ({_SESSION_ORACLE}),
    m AS (SELECT MAX(ts) AS mx FROM events)
    SELECT user_id, n_events, session_start,
           session_end + INTERVAL {SESSION_GAP_MIN} MINUTE AS window_end,
           total_value
    FROM base CROSS JOIN m
    WHERE session_end + INTERVAL {SESSION_GAP_MIN} MINUTE <= m.mx
    """


@register(
    "stream_session_window_gated",
    _session_gated_oracle(),
    doc="Streaming session_window under the oracle gate: gap-merged "
        "sessions (30-min inactivity) as a WATERMARKED streaming "
        "aggregate in append mode. The watermark finalization rule IS "
        "the semantics being pinned: append emits exactly the "
        "sessions the terminal watermark closed — last_event + gap "
        "<= max event time — so the oracle is the batch "
        "sessionization FILTERED to closed sessions (verified: 9542 "
        "of 9549 at sf0.01; the 7 still-open tails are correctly "
        "withheld). This boundary is what a real deployment reasons "
        "about when it drains a session stream: open sessions live "
        "in the state store, not the sink.",
)
def stream_session_window_gated(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sessions_and_ann import SESSION_GAP_MIN, dsum
    src = _stream_source(spark, sf_dir, "events")
    agg = (src.withWatermark("ts", "0 seconds")
              .groupBy("user_id",
                       F.session_window("ts", f"{SESSION_GAP_MIN} minutes"))
              .agg(F.count("*").alias("n_events"),
                   F.min("ts").alias("session_start"),
                   dsum("value").alias("total_value")))
    with _state_sized_shuffle(spark):
        out = _drain_to_memory(agg, "append")
    return out.select("user_id", "n_events", "session_start",
                      F.col("session_window.end").alias("window_end"),
                      "total_value")


@register(
    "stream_dedup_watermark_gated",
    """
    SELECT event_type, COUNT(DISTINCT user_id) AS n_unique_users
    FROM events GROUP BY event_type
    """,
    doc="dropDuplicatesWithinWatermark under the oracle gate — the "
        "BOUNDED-state streaming dedup (§2.10 T5 at scale): unlike "
        "dropDuplicates, whose key set grows forever, state here is "
        "evicted once the event-time watermark passes a key's last "
        "sighting, so an unbounded stream holds only the trailing "
        "window of keys. Dedup key (event_type, user_id) with a "
        "1-hour watermark on ts; which physical row survives depends "
        "on arrival order, so the gated output is the order-free "
        "projection (distinct-user counts), which must equal the "
        "batch COUNT(DISTINCT). availableNow over one file = one "
        "micro-batch, so no key is ever re-admitted after eviction "
        "and the counts are exact — the determinism boundary a real "
        "deployment manages by sizing the watermark to the max "
        "duplicate lag.",
)
def stream_dedup_watermark_gated(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = _stream_source(spark, sf_dir, "events")
    deduped = (src.select("event_type", "user_id", "ts")
                  .withWatermark("ts", "1 hour")
                  .dropDuplicatesWithinWatermark(["event_type", "user_id"]))
    with _state_sized_shuffle(spark):
        out = _drain_to_memory(deduped, "append")
    return (out.groupBy("event_type")
               .agg(F.count("*").alias("n_unique_users")))


@register(
    "stream_stream_join_gated",
    f"""
    WITH v AS (SELECT user_id, ts AS view_ts FROM events
               WHERE event_type = 'view'),
    p AS (SELECT user_id, ts AS buy_ts, value FROM events
          WHERE event_type = 'purchase')
    SELECT v.user_id, COUNT(*) AS n_attributed,
           CAST(SUM(CAST(p.value AS DECIMAL(38,6))) AS DOUBLE)
             AS attributed_value
    FROM v JOIN p ON v.user_id = p.user_id
      AND p.buy_ts >= v.view_ts
      AND p.buy_ts <= v.view_ts + INTERVAL 30 MINUTE
    GROUP BY v.user_id
    """,
    doc="Stream-STREAM join under the oracle gate (the missing §2.10 "
        "join shape): two file-source streams over the same events "
        "parquet — views and purchases — joined on user with an "
        "event-time range (purchase within 30 min after the view, the "
        "attribution-window join), both sides watermarked so the "
        "state store can evict rows older than the join window, "
        "drained with availableNow and rolled up in batch. The value "
        "hash must equal the batch time-range join, pinning the "
        "streaming join's buffering/matching semantics. At 100 TB "
        "the watermark bound is what keeps join state finite: each "
        "side holds only the last 30+delta minutes of rows per "
        "shuffle partition, independent of stream length.",
)
def stream_stream_join_gated(spark: SparkSession, sf_dir: str) -> DataFrame:
    views = (_stream_source(spark, sf_dir, "events")
             .filter(F.col("event_type") == "view")
             .select("user_id", F.col("ts").alias("view_ts"))
             .withWatermark("view_ts", "1 hour"))
    buys = (_stream_source(spark, sf_dir, "events")
            .filter(F.col("event_type") == "purchase")
            .select(F.col("user_id").alias("b_user"),
                    F.col("ts").alias("buy_ts"), "value")
            .withWatermark("buy_ts", "1 hour"))
    joined = views.join(
        buys,
        (F.col("user_id") == F.col("b_user"))
        & (F.col("buy_ts") >= F.col("view_ts"))
        & (F.col("buy_ts") <= F.col("view_ts") + F.expr("INTERVAL 30 MINUTES")))
    # stateful-shuffle sizing: see _state_sized_shuffle (measured
    # 8.0s -> 4.3s on this join with 8 stores)
    with _state_sized_shuffle(spark):
        out = _drain_to_memory(joined, "append")
    return (out.groupBy("user_id")
               .agg(F.count("*").alias("n_attributed"),
                    F.sum(F.col("value").cast("decimal(38,6)"))
                     .cast("double").alias("attributed_value")))


@register(
    "stream_matview_gated",
    """
    SELECT year(o_orderdate::DATE)::INT AS year,
           month(o_orderdate::DATE)::INT AS month,
           CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                AS BIGINT) AS revenue_cents,
           COUNT(*)::BIGINT AS n_orders
    FROM orders GROUP BY 1, 2
    """,
    doc="Incremental materialized-view maintenance under the oracle "
        "gate (previously pytest-only, tests/test_matview.py): a REAL "
        "streaming job writes month-grain PARTIAL aggregates to a "
        "batch_id-partitioned log (streaming/matview.py — dynamic "
        "partition overwrite makes replayed batches idempotent), and "
        "the returned view is read_rollup's re-aggregation of that "
        "log — which must value-hash-match a direct batch group-by "
        "over all the data (the algebraic-fold guarantee "
        "mergeable_partial_aggs pins, here exercised through the "
        "actual foreachBatch -> log -> fold machinery). Revenue folds "
        "as integer cents, so the maintained view is bit-equal, not "
        "approximately equal. At 100 TB the log holds |months| x "
        "|batches| rows regardless of fact volume and the view never "
        "rescans history.",
)
def stream_matview_gated(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    from ..functions.core import cleanup_at_exit
    from ..streaming.matview import read_rollup, stream_monthly_revenue_log
    src = _stream_source(spark, sf_dir, "orders")
    tag = uuid.uuid4().hex[:12]
    log = tempfile.mkdtemp(prefix=f"sg_mv_{tag}_log_")
    ckpt = tempfile.mkdtemp(prefix=f"sg_mv_{tag}_ckpt_")
    try:
        q = stream_monthly_revenue_log(src, log, ckpt, available_now=True)
        q.awaitTermination()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    # the returned view stays LAZY (no driver collect): the log dir
    # outlives this builder and is removed at interpreter exit, the
    # same scratch policy as ann_ivf_index_probe's on-disk layout
    cleanup_at_exit(log)
    return read_rollup(spark, log)


@register(
    "stream_sessions_state_gated",
    f"""
    WITH e AS (
      SELECT user_id, ts, event_id,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents,
             CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w)
                       > 30 * 60 * 1000000
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
      FROM events WHERE user_id % 16 = 0
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts, cents,
             SUM(new_sess) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_idx
      FROM e
    ),
    g AS (
      SELECT user_id, session_idx, COUNT(*) AS n_events,
             min(ts) AS session_start, max(ts) AS session_end,
             CAST(SUM(cents) AS BIGINT) AS total_value_cents
      FROM s GROUP BY user_id, session_idx
    ),
    mx AS (SELECT user_id, MAX(session_idx) AS last_idx FROM g
           GROUP BY user_id)
    SELECT g.user_id, g.n_events, g.session_start, g.session_end,
           g.total_value_cents
    FROM g JOIN mx USING (user_id) WHERE g.session_idx < mx.last_idx
    """,
    doc="CUSTOM stateful streaming operator under the oracle gate "
        "(§2.9 x §2.10): gap-based sessionization via "
        "applyInPandasWithState (streaming/sessions.py) — per-key "
        "state that survives micro-batches, the extension point for "
        "anything Spark's built-in stateful operators cannot express. "
        "The drained output is the IN-STREAM-CLOSED sessions: a "
        "session is emitted exactly when a later event of the same "
        "user breaks the 30-min gap, so the oracle is the batch "
        "sessionization minus each user's final session (the "
        "still-open tail lives in the state store, the same boundary "
        "stream_session_window_gated pins for the built-in operator). "
        "Values enter the operator pre-quantized to integer cents, so "
        "the Python-side accumulation is exact regardless of order "
        "and the total is bit-portable. availableNow over one file is "
        "one data batch — CROSS-batch state survival and the "
        "event-time-timeout flush are pinned by the multi-batch "
        "replay equivalence test (tests/test_streaming_sessions.py); "
        "this gate pins the Arrow stateful plumbing, the state "
        "update/emit semantics, and the schema contract against an "
        "independent engine. The plan node is "
        "FlatMapGroupsInPandasWithState — Arrow-batched grouped "
        "state, not a row-pickling evaluator.",
)
def stream_sessions_state_gated(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.sessions import sessionize_stream
    # gate scope: a deterministic 1/16 user cohort — the stateful
    # machinery is identical for any key subset, and the dominant cost
    # is per-GROUP (one Python handler round-trip per user per batch),
    # so the gate pins semantics at a fraction of the drain cost (the
    # native twins are the full-population path)
    src = (_stream_source(spark, sf_dir, "events")
           .filter(F.col("user_id") % 16 == 0))
    # integer cents BEFORE the stateful operator: python float sums of
    # integers < 2^53 are exact, so accumulation order cannot drift
    cents = src.withColumn(
        "value", F.floor(F.col("value") * 100 + F.lit(0.5)).cast("double"))
    sess = sessionize_stream(cents, gap_minutes=30, watermark=None)
    # state-store sizing: see _state_sized_shuffle (each state
    # partition pays per-batch instantiation/commit plus an Arrow
    # round-trip here)
    with _state_sized_shuffle(spark):
        out = _drain_to_memory(sess, "append")
    return out.select("user_id", "n_events", "session_start",
                      "session_end",
                      F.col("total_value").cast("bigint")
                       .alias("total_value_cents"))


@register(
    "stream_classifier_scores_gated",
    None,  # oracle patched below (shared with the batch twin)
    doc="Offline-train / online-serve under the oracle gate: the "
        "hashed linear quality classifier is FIT batch-side "
        "(operators/classifier.py), the <=1024-row weight table is "
        "pulled to the driver as the model artifact (bounded by the "
        "bucket count regardless of corpus size — the one collect "
        "pattern that is correct at 100 TB, a model is not data) and "
        "embedded as a literal weight array, and a REAL streaming "
        "job scores every doc PURELY MAP-SIDE (one hash + one array "
        "lookup + one decimal add per token — no state, no shuffle "
        "before the final rollup) with the same per-source confusion "
        "output as the batch twin. The drained result must value-"
        "hash-match the batch DuckDB oracle: a skew in the frozen "
        "weights, the streaming tokenization, or the score "
        "arithmetic breaks the hash.",
)
def stream_classifier_scores_gated(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    from ..functions.text import quality_score, word_tokens
    from ..operators.classifier import N_BUCKETS, hashed_logodds_weights
    from ..operators.hashing import h32
    from ..sources.registry import load_table

    # fit side NOT rebalanced — see quality_classifier_scores (the
    # labeled frame feeds two fit subtrees; the exchange costs more
    # than the narrow explode it widens)
    d = load_table(spark, sf_dir, "documents")
    labeled = d.withColumn("label_high",
                           quality_score(F.col("text")) >= 0.5)
    # model artifact: bucket -> exact-integer weight (decimal(38,0))
    model = {r["bucket"]: r["w"]
             for r in hashed_logodds_weights(labeled,
                                             "label_high").collect()}
    warr = F.array(*[
        F.lit(str(model.get(b, 0))).cast("decimal(38,0)")
        for b in range(N_BUCKETS)])

    # serve side: each micro-batch of the file stream plans 1-2 scan
    # tasks (byte-split), so the per-doc scoring (quality_score + one
    # hash/add per token) would serialize — a stateless repartition
    # inside the streaming query widens the map stage; the complete-
    # mode rollup after it is unchanged (counts are order-free)
    src = _stream_source(spark, sf_dir, "documents") \
        .repartition(spark.sparkContext.defaultParallelism)
    toks = word_tokens(F.lower(F.col("text")))
    contribs = F.transform(
        toks,
        lambda t: F.element_at(warr, (h32(t) % N_BUCKETS).cast("int") + 1))
    score = F.aggregate(
        contribs, F.lit(0).cast("decimal(38,0)"),
        lambda acc, x: (acc + x).cast("decimal(38,0)"))
    scored = src.select(
        "source",
        (quality_score(F.col("text")) >= 0.5).alias("label_high"),
        (score > 0).alias("pred_high"))
    agg = scored.groupBy("source", "label_high", "pred_high").agg(
        F.count("*").alias("n_docs"))
    # state-store sizing (the one stateful drain r9's sweep missed):
    # the complete-mode rollup keeps its handful of groups in a state
    # store whose partition count pins to shuffle.partitions at the
    # first checkpoint — 32 stores are pure per-batch overhead for a
    # <=#sources*4-row state. The explicit repartition above keeps the
    # per-doc scoring map stage at full width regardless.
    with _state_sized_shuffle(spark):
        return _drain_to_memory(agg, "complete")


def _patch_stream_classifier_oracle() -> None:
    from . import REGISTRY as _reg
    from . import QuerySpec as _qs
    from .curation_wave6 import _classifier_sql

    _reg["stream_classifier_scores_gated"] = _qs(
        fn=_reg["stream_classifier_scores_gated"].fn,
        oracle=_classifier_sql(),
        doc=_reg["stream_classifier_scores_gated"].doc)


_patch_stream_classifier_oracle()


def _bm25_stream_oracle() -> str:
    from .retrieval import _TOPK, _bm25_ctes
    return f"""
    WITH {_bm25_ctes(_TOPK)}
    SELECT q_id, doc_id, sparse_rank AS rank FROM bm25
    """


@register(
    "stream_bm25_index_gated",
    None,  # oracle attached below — retrieval.py registers later in
           # load_registry order, so the CTE builder is imported lazily
    doc="Incremental BM25 index maintenance under the oracle gate: a "
        "REAL streaming job ingests the documents table through "
        "foreachBatch, each micro-batch writing its own postings/df/"
        "stats partitions (operators/bm25.py::write_bm25_batch — "
        "batch_id = epoch id, dynamic partition overwrite makes "
        "replayed epochs idempotent), and the returned result PROBES "
        "the maintained index — which must value-hash-match the "
        "inline batch bm25_topk plan exactly, because the per-batch "
        "df/avgdl partials merge as exact integer sums (the same "
        "algebraic-fold guarantee stream_matview_gated pins, here for "
        "a search index instead of a rollup). At 100 TB this is the "
        "standing index-refresh service: new corpus batches append "
        "their own partitions; probes never rescan history.",
)
def stream_bm25_index_gated(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from ..functions.core import cleanup_at_exit
    from ..operators.bm25 import (probe_bm25_index, query_terms,
                                  write_bm25_batch)
    from ..sources.registry import load_table
    from .retrieval import _N_QUERY_DOCS, _TOPK
    src = _stream_source(spark, sf_dir, "documents")
    tag = uuid.uuid4().hex[:12]
    idx = tempfile.mkdtemp(prefix=f"sg_bm25s_{tag}_idx_")
    # registered BEFORE the stream starts: a failing streaming query
    # must not leak the index dir (ADVICE r6) — the probe below reads
    # it lazily within the same process lifetime, so exit-time
    # cleanup is still correct
    cleanup_at_exit(idx)
    ckpt = tempfile.mkdtemp(prefix=f"sg_bm25s_{tag}_ckpt_")

    def ingest(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        write_bm25_batch(batch_df, idx, batch_id=epoch_id)

    try:
        q = (src.writeStream.foreachBatch(ingest)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True).start())
        q.awaitTermination()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    docs = load_table(spark, sf_dir, "documents")
    seeds = query_terms(docs.filter(F.col("doc_id") < _N_QUERY_DOCS))
    return probe_bm25_index(seeds, idx, k=_TOPK)


def _patch_stream_bm25_oracle() -> None:
    """Attach the shared BM25 oracle after registration (retrieval.py
    owns the CTE builder; importing it at module top would invert the
    registry's import order)."""
    import dataclasses

    from . import REGISTRY
    spec = REGISTRY["stream_bm25_index_gated"]
    if spec.oracle is None:
        REGISTRY["stream_bm25_index_gated"] = dataclasses.replace(
            spec, oracle=_bm25_stream_oracle())


_patch_stream_bm25_oracle()


def _gdpr_stream_oracle() -> str:
    from . import REGISTRY
    return REGISTRY["gdpr_delete_propagation"].oracle


@register(
    "stream_gdpr_tombstones_gated",
    None,  # oracle attached below (shared with the batch cascade —
           # curation_wave7 registers earlier in load_registry order)
    doc="Streaming GDPR tombstone propagation under the oracle gate: "
        "a REAL streaming job ingests the customer table through "
        "foreachBatch; each micro-batch extracts its erasure requests "
        "and appends them to a persisted transaction-log tombstone "
        "table via TxTable.commit_once(token=epoch id) — the exactly-"
        "once idiom txlog_exactly_once_replay pins in batch, here "
        "doing compliance duty: a replayed epoch is a no-op, so the "
        "accumulated tombstone set is exact under at-least-once "
        "delivery. The returned audit runs the SAME cascade helper as "
        "the batch gdpr_delete_propagation over the accumulated "
        "snapshot and must value-hash-match its oracle — pinning that "
        "stream-accumulated tombstones drive the identical "
        "orders/lineitem/events cascade. At 100 TB this is the "
        "standing right-to-be-forgotten service: requests arrive "
        "continuously, the tombstone log stays tiny and broadcasts "
        "into every fact scan; the periodic rewrite job reads the "
        "same snapshot.",
)
def stream_gdpr_tombstones_gated(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from ..functions.core import cleanup_at_exit
    from ..operators.txlog import TxTable
    from .curation_wave7 import _GDPR_MOD, _gdpr_cascade_audit

    from ..sources.registry import load_table
    src = _stream_source(spark, sf_dir, "customer")
    tag = uuid.uuid4().hex[:12]
    log_dir = tempfile.mkdtemp(prefix=f"sg_gdpr_{tag}_log_")
    # registered BEFORE the stream starts so a failing stream cannot
    # leak the dir; the audit below reads the snapshot lazily within
    # the same process lifetime (stream_bm25_index_gated precedent)
    cleanup_at_exit(log_dir)
    ckpt = tempfile.mkdtemp(prefix=f"sg_gdpr_{tag}_ckpt_")

    def ingest(batch_df: DataFrame, epoch_id: int) -> None:
        tomb = (batch_df.select("c_custkey")
                        .filter(F.col("c_custkey") % _GDPR_MOD == 0))
        if tomb.isEmpty():
            return
        TxTable(batch_df.sparkSession, log_dir).commit_once(
            tomb, token=f"tomb/{epoch_id}")

    try:
        q = (src.writeStream.foreachBatch(ingest)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True).start())
        q.awaitTermination()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    log = TxTable(spark, log_dir)
    if log.latest_version() is None:
        # no erasure request in the whole stream: empty tombstone set
        tomb = (load_table(spark, sf_dir, "customer")
                .select("c_custkey").limit(0))
    else:
        # distinct() is replay hardening only — commit_once already
        # guarantees each epoch lands exactly once
        tomb = log.snapshot().select("c_custkey").distinct()
    return _gdpr_cascade_audit(spark, sf_dir, tomb)


def _patch_stream_gdpr_oracle() -> None:
    import dataclasses

    from . import REGISTRY
    spec = REGISTRY["stream_gdpr_tombstones_gated"]
    if spec.oracle is None:
        REGISTRY["stream_gdpr_tombstones_gated"] = dataclasses.replace(
            spec, oracle=_gdpr_stream_oracle())


_patch_stream_gdpr_oracle()


@register(
    "stream_minhash_index_gated",
    None,  # oracle attached below (shared with minhash_lsh_pairs —
           # llm_ext registers later in load_registry order)
    doc="Continuous fuzzy-dedup index maintenance under the oracle "
        "gate: a REAL streaming job ingests the documents table "
        "through foreachBatch; each micro-batch computes its MinHash "
        "signatures ONCE and appends the banded rows to a persisted "
        "(batch_id, band)-partitioned index (operators/dedup.py::"
        "write_minhash_batch — dynamic partition overwrite makes "
        "replayed epochs idempotent, the write_bm25_batch contract). "
        "The returned result self-joins the ACCUMULATED index on "
        "(band, key) and verifies exact hashed-shingle Jaccard — and "
        "must value-hash-match the batch minhash_lsh_pairs oracle, "
        "pinning that cross-batch banding finds exactly the pairs a "
        "monolithic corpus pass finds (band keys are pure functions "
        "of the signature, so cross-batch candidates fall out of the "
        "same equi-join). At 100 TB this is the standing dedup "
        "service: each arriving batch signs itself once, probes "
        "history by equi-join, and text never rides a shuffle.",
)
def stream_minhash_index_gated(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from ..functions.core import cleanup_at_exit
    from ..operators.dedup import lsh_pairs_from_index, write_minhash_batch

    src = _stream_source(spark, sf_dir, "documents")
    tag = uuid.uuid4().hex[:12]
    idx = tempfile.mkdtemp(prefix=f"sg_mhidx_{tag}_")
    cleanup_at_exit(idx)
    ckpt = tempfile.mkdtemp(prefix=f"sg_mhidx_{tag}_ckpt_")

    def ingest(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        from .llm_ext import _BANDS, MINHASH_COEFFS
        write_minhash_batch(batch_df, idx, batch_id=epoch_id,
                            coeffs=MINHASH_COEFFS, bands=_BANDS)

    try:
        q = (src.writeStream.foreachBatch(ingest)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True).start())
        q.awaitTermination()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    return lsh_pairs_from_index(spark, idx, threshold=0.3)


def _patch_stream_minhash_oracle() -> None:
    import dataclasses

    from . import REGISTRY
    from . import llm_ext  # noqa: F401 — forces its registration
    spec = REGISTRY["stream_minhash_index_gated"]
    if spec.oracle is None:
        REGISTRY["stream_minhash_index_gated"] = dataclasses.replace(
            spec, oracle=REGISTRY["minhash_lsh_pairs"].oracle)


_patch_stream_minhash_oracle()
