"""[EXT] Retrieval queries over the ``documents`` / ``embeddings``
tables: BM25 lexical top-k, dense+sparse hybrid fusion (reciprocal
rank fusion), and a sparse-vs-dense agreement audit.

A training-data pipeline needs retrieval in two places: (a) "more
like this" expansion — given seed documents, pull the lexically /
semantically closest corpus documents into a curriculum or an eval
split; (b) retrieval-based decontamination and attribution. BM25
(Robertson et al., the Lucene ``k1``/``b`` variant with the
non-negative idf ``ln(1 + (N - df + 0.5)/(df + 0.5))``) is the
standard lexical scorer; reciprocal rank fusion (Cormack, Clarke &
Büttcher, SIGIR 2009: ``score = Σ 1/(k + rank)``, k=60) is the
standard way to combine it with an embedding retriever without score
calibration.

Numeric parity notes (the repo-wide policy, queries/__init__.py):

- BM25 term contributions are doubles (the idf carries an ``ln``);
  each contribution is cast to DECIMAL(38,9) BEFORE the per-document
  sum, so the sum is exact and order-free — partition-invariant in
  Spark and identical in DuckDB. The float score itself is never
  output (ln is libm-dependent in the last bit — same call as
  tfidf_top_terms); ranks with a doc_id tiebreak are portable.
- RRF scores ARE output: every term is ``1/(60+rank)`` — one IEEE
  divide of exact integers — and the fusion sum has exactly two
  addends, so the double is bit-identical across engines.
- The tf-normalization is pure rational arithmetic on exact inputs
  (tf, dl are integers; avgdl is one IEEE divide of exact integers;
  k1/b constants are injected as the same double literal on both
  sides), written in the same association order in both engines.

Scale posture (100 TB): the document-frequency table and the
query-term set are vocabulary-/query-sized → broadcast; ``tf`` and
``dl`` are corpus-sized but co-partitioned on doc_id (one shuffle);
candidate generation is an equi-join on term — only documents sharing
a query term are scored, never the full corpus per query. The dense
side broadcasts the query vectors over one corpus scan
(operators/similarity.py). Fusion and overlap join two top-k lists —
(n_queries × pool) rows, trivially broadcastable.

Reference parity: the reference has no retrieval surface (SURVEY.md
§2.3 notes it has no joins at all); this module is [EXT] per the
north star. Formulas follow the public literature cited above.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import word_tokens
from ..sources.registry import load_table
from . import register
from .llm_ext import _cosine_sql, _tok_sql

# Pinned scoring constants — canonical definitions live in
# operators/bm25.py (the index builder must score identically).
# Injected via repr() into the oracle SQL and via F.lit() into the
# Spark plan so both engines compute with the SAME double literals
# (1.2 + 1.0 re-computed at runtime could round differently than the
# literal 2.2).
from ..operators.bm25 import B as _B
from ..operators.bm25 import K1 as _K1
from ..operators.bm25 import K1_PLUS_1 as _K1_PLUS_1
from ..operators.bm25 import ONE_MINUS_B as _ONE_MINUS_B
from ..operators.bm25 import bm25_contribution as _bm25_contribution
_N_QUERY_DOCS = 5   # query docs: doc_id < 5 ("more like this" seeds)
_TOPK = 10          # serving depth
_POOL_K = 20        # per-system pool depth feeding the fusion
_RRF_K = 60.0       # Cormack et al.'s constant


def _bm25_ctes(pool_k: int) -> str:
    """Oracle CTE chain ending in ``bm25 (q_id, doc_id, sparse_rank)``."""
    return f"""
    base AS (
      SELECT doc_id, text FROM documents WHERE length(trim(text)) > 0
    ),
    toks AS (
      SELECT doc_id, unnest({_tok_sql()}) AS term FROM base
    ),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
    ),
    dl AS (
      SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY doc_id
    ),
    stats AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
      FROM dl
    ),
    df AS (
      -- tf is already distinct per (doc_id, term), so document
      -- frequency is a plain COUNT(*) over it — no second pass over
      -- the exploded tokens.
      SELECT term, COUNT(*) AS df FROM tf GROUP BY term
    ),
    qterms AS (
      SELECT DISTINCT doc_id AS q_id, term FROM tf
      WHERE doc_id < {_N_QUERY_DOCS}
    ),
    contrib AS (
      SELECT q.q_id, t.doc_id,
             CAST(
               ln(1.0 + ((CAST(s.n AS DOUBLE) - CAST(f.df AS DOUBLE) + 0.5)
                         / (CAST(f.df AS DOUBLE) + 0.5)))
               * ((CAST(t.tf AS DOUBLE) * {_K1_PLUS_1!r})
                  / (CAST(t.tf AS DOUBLE)
                     + {_K1!r} * ({_ONE_MINUS_B!r}
                                  + {_B!r} * (CAST(d.dl AS DOUBLE)
                                              / s.avgdl))))
               AS DECIMAL(38,9)) AS c
      FROM tf t
      JOIN qterms q USING (term)
      JOIN df f USING (term)
      JOIN dl d ON d.doc_id = t.doc_id
      CROSS JOIN stats s
      WHERE t.doc_id <> q.q_id
    ),
    scored AS (
      SELECT q_id, doc_id, SUM(c) AS score FROM contrib
      GROUP BY q_id, doc_id
    ),
    bm25 AS (
      SELECT q_id, doc_id, sparse_rank FROM (
        SELECT q_id, doc_id,
               row_number() OVER (PARTITION BY q_id
                                  ORDER BY score DESC, doc_id)
                 AS sparse_rank
        FROM scored)
      WHERE sparse_rank <= {pool_k}
    )"""


def _dense_ctes(pool_k: int) -> str:
    """Oracle CTE chain ending in ``dense (q_id, doc_id, dense_rank)``
    — brute-force cosine over embeddings (vec_id ≡ doc_id)."""
    return f"""
    dq AS (
      SELECT vec_id AS q_id, embedding AS qv FROM embeddings
      WHERE vec_id < {_N_QUERY_DOCS}
    ),
    dsims AS (
      SELECT dq.q_id, e.vec_id AS doc_id,
             {_cosine_sql('dq.qv', 'e.embedding')} AS cosine
      FROM dq JOIN embeddings e ON e.vec_id <> dq.q_id
    ),
    dense AS (
      SELECT q_id, doc_id, dense_rank FROM (
        SELECT q_id, doc_id,
               row_number() OVER (PARTITION BY q_id
                                  ORDER BY cosine DESC, doc_id)
                 AS dense_rank
        FROM dsims)
      WHERE dense_rank <= {pool_k}
    )"""


def _bm25_ranked(spark: SparkSession, sf_dir: str, pool_k: int) -> DataFrame:
    """Spark twin of :func:`_bm25_ctes` — returns
    ``(q_id, doc_id, sparse_rank)`` with ``sparse_rank <= pool_k``."""
    from ..operators.cache import track
    d = load_table(spark, sf_dir, "documents") \
        .filter(F.length(F.trim("text")) > 0)
    toks = d.select(
        "doc_id",
        F.explode(word_tokens(F.lower(F.col("text")))).alias("term"))
    # Every downstream relation (dl, stats, df, qterms, contrib)
    # derives from tf, so persist it once — otherwise the
    # tokenize+explode subtree re-runs per branch (5×). tf is the
    # narrow (doc_id, term, count) relation, far smaller than the
    # exploded tokens; the stats action below materializes it.
    tf = track(toks.groupBy("doc_id", "term")
                   .agg(F.count("*").alias("tf")).persist())
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(F.count("*").alias("n"), F.sum("dl").alias("tot")).first()
    n_docs = int(stats["n"])
    # One IEEE divide of exact integers — identical to the oracle's
    # SUM(dl)::DOUBLE / COUNT(*)::DOUBLE.
    avgdl = float(stats["tot"]) / float(n_docs)
    # tf is distinct per (doc_id, term): df = COUNT(*), no pass over
    # the exploded tokens (mirrors the oracle's df CTE).
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    qterms = (tf.filter(F.col("doc_id") < _N_QUERY_DOCS)
                .select(F.col("doc_id").alias("q_id"), "term").distinct())

    contrib = (tf.join(F.broadcast(qterms), "term")
                 .filter(F.col("doc_id") != F.col("q_id"))
                 .join(F.broadcast(df), "term")
                 .join(dl, "doc_id")
                 .select("q_id", "doc_id",
                         _bm25_contribution(F.col("tf"), F.col("dl"),
                                            F.col("df"), n_docs, avgdl)
                         .alias("c")))
    scored = contrib.groupBy("q_id", "doc_id").agg(F.sum("c").alias("score"))
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (scored.withColumn("sparse_rank", F.row_number().over(w))
                  .filter(F.col("sparse_rank") <= pool_k)
                  .select("q_id", "doc_id", "sparse_rank"))


def _dense_ranked(spark: SparkSession, sf_dir: str, pool_k: int) -> DataFrame:
    """Spark twin of :func:`_dense_ctes` — brute-force cosine ranks
    via operators/similarity.brute_force_topk."""
    from ..operators.similarity import brute_force_topk
    e = load_table(spark, sf_dir, "embeddings")
    q = (e.filter(F.col("vec_id") < _N_QUERY_DOCS)
          .select(F.col("vec_id").alias("q_id"), "embedding"))
    return (brute_force_topk(e, q, k=pool_k)
            .select("q_id", F.col("neighbor_id").alias("doc_id"),
                    F.col("rank").alias("dense_rank")))


@register(
    "bm25_topk",
    f"""
    WITH {_bm25_ctes(_TOPK)}
    SELECT q_id, doc_id, sparse_rank AS rank FROM bm25
    """,
    doc="BM25 more-like-this top-10 per seed document (Lucene "
        "k1=1.2/b=0.75 variant, non-negative idf). Term contributions "
        "are decimal-routed before the per-doc sum (order-free, "
        "partition-invariant); output is rank-only because the idf's "
        "ln is libm-dependent in the last bit (tfidf_top_terms "
        "precedent). df + query-term tables broadcast; candidates "
        "come from the term equi-join, never a full per-query scan.",
)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (_bm25_ranked(spark, sf_dir, _TOPK)
            .select("q_id", "doc_id", F.col("sparse_rank").alias("rank")))


@register(
    "hybrid_rrf_topk",
    f"""
    WITH {_bm25_ctes(_POOL_K)},
    {_dense_ctes(_POOL_K)},
    fused AS (
      SELECT COALESCE(b.q_id, d.q_id) AS q_id,
             COALESCE(b.doc_id, d.doc_id) AS doc_id,
             (CASE WHEN b.sparse_rank IS NULL THEN 0.0
                   ELSE 1.0 / ({_RRF_K!r} + CAST(b.sparse_rank AS DOUBLE))
              END
              + CASE WHEN d.dense_rank IS NULL THEN 0.0
                     ELSE 1.0 / ({_RRF_K!r} + CAST(d.dense_rank AS DOUBLE))
                END) AS rrf_score
      FROM bm25 b
      FULL OUTER JOIN dense d
        ON b.q_id = d.q_id AND b.doc_id = d.doc_id
    )
    SELECT q_id, doc_id, rrf_score, fused_rank FROM (
      SELECT q_id, doc_id, rrf_score,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY rrf_score DESC, doc_id)
               AS fused_rank
      FROM fused)
    WHERE fused_rank <= {_TOPK}
    """,
    doc="Hybrid retrieval: reciprocal rank fusion (1/(60+rank), "
        "Cormack et al. 2009) of the BM25 top-20 and the brute-force "
        "cosine top-20 over the aligned embeddings table. The RRF "
        "score is bit-portable (IEEE divides of exact integers, "
        "two-addend sum) so it IS output, unlike the raw BM25 score. "
        "Fusion joins two (n_queries × 20)-row lists — broadcast at "
        "any corpus size.",
)
def hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    sparse = _bm25_ranked(spark, sf_dir, _POOL_K)
    dense = _dense_ranked(spark, sf_dir, _POOL_K)
    rrf = (F.when(F.col("sparse_rank").isNull(), F.lit(0.0))
            .otherwise(F.lit(1.0) / (F.lit(_RRF_K)
                                     + F.col("sparse_rank").cast("double")))
           + F.when(F.col("dense_rank").isNull(), F.lit(0.0))
              .otherwise(F.lit(1.0) / (F.lit(_RRF_K)
                                       + F.col("dense_rank").cast("double"))))
    fused = (sparse.join(dense, ["q_id", "doc_id"], "full_outer")
                   .select("q_id", "doc_id", rrf.alias("rrf_score")))
    w = Window.partitionBy("q_id").orderBy(F.desc("rrf_score"),
                                           F.asc("doc_id"))
    return (fused.withColumn("fused_rank", F.row_number().over(w))
                 .filter(F.col("fused_rank") <= _TOPK)
                 .select("q_id", "doc_id", "rrf_score", "fused_rank"))


@register(
    "retriever_overlap_at_k",
    f"""
    WITH {_bm25_ctes(_TOPK)},
    {_dense_ctes(_TOPK)}
    SELECT b.q_id, COUNT(d.doc_id)::BIGINT AS n_overlap,
           CAST(COUNT(d.doc_id) AS DOUBLE) / {float(_TOPK)!r} AS overlap_frac
    FROM bm25 b
    LEFT JOIN dense d ON b.q_id = d.q_id AND b.doc_id = d.doc_id
    GROUP BY b.q_id
    """,
    doc="Sparse-vs-dense agreement: |BM25 top-10 ∩ cosine top-10| per "
        "seed query. The retriever-disagreement diagnostic that "
        "decides whether hybrid fusion is worth running on a corpus — "
        "overlap near k means the retrievers are redundant, overlap "
        "near 0 means fusion changes the candidate set. Exact integer "
        "counts; the fraction is one IEEE divide.",
)
def retriever_overlap_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    sparse = _bm25_ranked(spark, sf_dir, _TOPK)
    dense = _dense_ranked(spark, sf_dir, _TOPK)
    return (sparse.join(dense, ["q_id", "doc_id"], "left")
                  .groupBy("q_id")
                  .agg(F.count("dense_rank").alias("n_overlap"),
                       (F.count("dense_rank").cast("double")
                        / F.lit(float(_TOPK))).alias("overlap_frac")))


@register(
    "bm25_index_probe",
    f"""
    WITH {_bm25_ctes(_TOPK)}
    SELECT q_id, doc_id, sparse_rank AS rank FROM bm25
    """,
    doc="The ON-DISK BM25 path (operators/bm25.py): the corpus is "
        "indexed in TWO batches (doc_id%4 split — the second batch "
        "exercises incremental append: df/avgdl partials merge at "
        "probe time as exact integer sums), then the seed queries are "
        "answered by probing the persisted postings — the probe reads "
        "only the query terms' term_bucket partitions (static "
        "partition pruning from the probe's own bounded vocabulary). "
        "Scoring arithmetic is the SAME bm25_contribution expression "
        "as the inline bm25_topk, so this shares its oracle: the "
        "build-once/probe-forever layout must compute exactly what "
        "the inline plan computes. The serving shape of lexical "
        "retrieval at 100 TB — per query Σ postings(t), never a "
        "corpus scan.",
)
def bm25_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bm25 import probe_bm25_index, query_terms
    docs = load_table(spark, sf_dir, "documents")
    path = _shared_bm25_index(spark, sf_dir)
    q = query_terms(docs.filter(F.col("doc_id") < _N_QUERY_DOCS))
    return probe_bm25_index(q, path, k=_TOPK)


def _shared_bm25_index(spark: SparkSession, sf_dir: str) -> str:
    """Session-shared on-disk BM25 index over ``documents`` (two
    appended batches — the incremental-ingest shape). Keyed by
    (sf_dir, applicationId): concurrent runs get disjoint paths;
    built ONCE per session (stage + atomic rename, the
    ann_ivf_index_probe pattern — no half-built layout is ever
    probeable); removed at interpreter exit. Serves both the BM25
    probe and the positional phrase probe — one build, two
    workloads."""
    import hashlib
    import os
    import tempfile

    from ..functions.core import cleanup_at_exit
    from ..operators.bm25 import write_bm25_batch
    docs = load_table(spark, sf_dir, "documents")
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    app = spark.sparkContext.applicationId
    path = os.path.join(tempfile.gettempdir(), f"sg_bm25_{app}_{tag}")
    marker = os.path.join(path, "_SUCCESS_LAYOUT")
    if not os.path.exists(marker):
        import shutil
        import uuid
        cleanup_at_exit(path)
        staged = f"{path}.staging.{uuid.uuid4().hex[:12]}"
        cleanup_at_exit(staged)
        write_bm25_batch(docs.filter(F.col("doc_id") % 4 != 0), staged,
                         batch_id=0)
        write_bm25_batch(docs.filter(F.col("doc_id") % 4 == 0), staged,
                         batch_id=1)
        open(os.path.join(staged, "_SUCCESS_LAYOUT"), "w").close()
        try:
            os.rename(staged, path)
        except OSError:
            # another builder published first; its layout is identical
            # (same deterministic inputs) — use it
            shutil.rmtree(staged, ignore_errors=True)
    return path


# Shared by phrase_search_top_bigram (inline scan) and
# phrase_search_indexed (positional-postings probe) — the twin pair
# must hash-match each other AND this oracle.
# top-bigram derivation shared by the phrase and proximity oracles
_TOPBG_CTES = f"""
    WITH base AS (
      SELECT doc_id, {_tok_sql()} AS toks FROM documents
      WHERE length(trim(text)) > 0
    ),
    bg AS (
      SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
      FROM base, unnest(range(1, len(toks))) AS u(i)
    ),
    top_bg AS (
      SELECT w1, w2 FROM (
        SELECT w1, w2, COUNT(*) AS c FROM bg GROUP BY w1, w2
        ORDER BY c DESC, w1, w2 LIMIT 1)
    )"""

_PHRASE_ORACLE = f"""
    {_TOPBG_CTES}
    SELECT b.doc_id,
           len([i for i in range(1, len(b.toks))
                IF b.toks[i] = t.w1 AND b.toks[i+1] = t.w2])::BIGINT
             AS n_matches
    FROM base b CROSS JOIN top_bg t
    WHERE len([i for i in range(1, len(b.toks))
               IF b.toks[i] = t.w1 AND b.toks[i+1] = t.w2]) > 0
    """


@register(
    "phrase_search_top_bigram",
    _PHRASE_ORACLE,
    doc="Phrase search: find every document containing the corpus's "
        "most frequent bigram as a CONSECUTIVE phrase, with exact "
        "occurrence counts. The phrase is data-derived (top bigram by "
        "count, lexicographic tiebreak — deterministic), and matching "
        "is a pure per-row array expression over the token array — "
        "zero shuffle on the matching side; the only shuffle trains "
        "the 2-row broadcast phrase table. At 100 TB the scan-side "
        "expression IS the right plan for one-off phrases; the "
        "standing-workload serving shape is the positional-index "
        "probe twin phrase_search_indexed (same oracle, must "
        "hash-match this query). Exact integers end-to-end.",
)
def phrase_search_top_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _tokenized_base(spark, sf_dir)
    top_bg = _top_bigram(base)
    matches = F.expr(
        "size(filter(sequence(1, size(toks) - 1), "
        "i -> toks[i-1] = w1 AND toks[i] = w2))").cast("bigint")
    return (base.filter(F.size("toks") >= 2)
                .crossJoin(F.broadcast(top_bg))
                .select("doc_id", matches.alias("n_matches"))
                .filter(F.col("n_matches") > 0))


def _tokenized_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents") \
        .filter(F.length(F.trim("text")) > 0)
    return d.select("doc_id",
                    word_tokens(F.lower(F.col("text"))).alias("toks"))


def _top_bigram(base: DataFrame) -> DataFrame:
    """The corpus's most frequent bigram (count, then lexicographic
    tiebreak — deterministic) as a 1-row (w1, w2) frame."""
    bg = (base.filter(F.size("toks") >= 2)
              .select("doc_id",
                      F.explode(F.expr(
                          "transform(sequence(1, size(toks) - 1), "
                          "i -> struct(toks[i-1] AS w1, toks[i] AS w2))"))
                       .alias("b"))
              .select("b.w1", "b.w2"))
    return (bg.groupBy("w1", "w2").agg(F.count("*").alias("c"))
              .orderBy(F.desc("c"), F.asc("w1"), F.asc("w2")).limit(1)
              .select("w1", "w2"))


@register(
    "phrase_search_indexed",
    _PHRASE_ORACLE,
    doc="Positional-index phrase search — the SERVING twin of "
        "phrase_search_top_bigram (same oracle; the two must "
        "hash-match). The corpus's top bigram probes the session-"
        "shared on-disk BM25 index (operators/bm25.py), whose "
        "postings carry a sorted positions array: candidates are "
        "postings(w1) joined postings(w2) on doc_id — only the two "
        "phrase terms' term_bucket partitions are read (static "
        "pruning, pinned in tests/test_bm25_index.py) — and the "
        "occurrence count is |{{p in pos(w1): p+1 in pos(w2)}}|, a "
        "per-row array_intersect. At 100 TB this is the standing-"
        "phrase-workload shape: per-phrase cost is the two postings "
        "lists, never a corpus scan; the corpus-wide work happened "
        "once at index-build time and appends incrementally per "
        "batch. Classic positional-postings design (Manning et al., "
        "IIR §2.4.2) re-expressed as DataFrame ops. Exact integers "
        "end-to-end.",
)
def phrase_search_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bm25 import phrase_probe
    path = _shared_bm25_index(spark, sf_dir)
    top_bg = _top_bigram(_tokenized_base(spark, sf_dir)) \
        .withColumn("phrase_id", F.lit(0))
    return (phrase_probe(top_bg, path)
            .select("doc_id", "n_matches"))


_PROX_WINDOW = 3


@register(
    "proximity_search_indexed",
    f"""
    {_TOPBG_CTES},
    pos AS (
      SELECT b.doc_id,
             [i for i in range(1, len(b.toks) + 1)
              IF b.toks[i] = t.w1] AS pos1,
             [i for i in range(1, len(b.toks) + 1)
              IF b.toks[i] = t.w2] AS pos2
      FROM base b CROSS JOIN top_bg t
    )
    SELECT doc_id,
           COALESCE(list_sum(
             [len([q for q in pos2
                   IF abs(q - p) <= {_PROX_WINDOW} AND q <> p])
              for p in pos1]), 0)::BIGINT AS n_pairs
    FROM pos
    WHERE COALESCE(list_sum(
            [len([q for q in pos2
                  IF abs(q - p) <= {_PROX_WINDOW} AND q <> p])
             for p in pos1]), 0) > 0
    """,
    doc=f"NEAR/{_PROX_WINDOW} proximity search from the positional "
        "index: every document where the corpus's top-bigram terms "
        f"co-occur within {_PROX_WINDOW} token positions (symmetric, "
        "unlike the directional phrase adjacency), with the exact "
        "count of qualifying position pairs. Candidates come from "
        "postings(w1) join postings(w2) on doc_id inside the two "
        "terms' term_bucket partitions — same pruned probe shape as "
        "phrase_search_indexed; the pair count is a nested "
        "higher-order array expression (aggregate over filter), "
        "JVM-side. Proximity is the ranking signal phrase match is "
        "too strict for (IIR §2.4.2's positional-index use case); at "
        "100 TB per-query cost stays at the two postings lists. The "
        "oracle recomputes positions from a corpus scan — index "
        "layout vs scan must agree exactly, pinning the positions "
        "arrays themselves (the phrase twin only pins adjacency). "
        "Exact integers end-to-end.",
)
def proximity_search_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bm25 import proximity_probe
    path = _shared_bm25_index(spark, sf_dir)
    top_bg = _top_bigram(_tokenized_base(spark, sf_dir)) \
        .withColumn("pair_id", F.lit(0))
    return (proximity_probe(top_bg, path, window=_PROX_WINDOW)
            .select("doc_id", "n_pairs"))


@register(
    "bm25_index_compaction_probe",
    f"""
    WITH {_bm25_ctes(_TOPK)}
    SELECT q_id, doc_id, sparse_rank AS rank FROM bm25
    """,
    doc="Index COMPACTION under the oracle gate — the standing "
        "maintenance op of any append-only index: the session-shared "
        "two-batch index is compacted into a single batch_id=0 layout "
        "(per-batch df/stats partials pre-merged by exact integer "
        "sums, postings re-partitioned once per term_bucket), then "
        "the seed queries probe the COMPACTED index. Shares the "
        "inline bm25_topk oracle, so the gate pins that compaction "
        "changes nothing a probe can observe — the algebraic-fold "
        "guarantee that lets a 100 TB deployment compact ingest "
        "history (bounding small-file count and probe-time partial "
        "merging) without a correctness re-validation. Compaction "
        "itself is one pass over the index, corpus-free; built once "
        "per session (stage + atomic rename, applicationId-keyed "
        "scratch).",
)
def bm25_index_compaction_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from ..functions.core import cleanup_at_exit
    from ..operators.bm25 import (compact_bm25_index, probe_bm25_index,
                                  query_terms)
    docs = load_table(spark, sf_dir, "documents")
    src = _shared_bm25_index(spark, sf_dir)
    dst = src + "_compacted"
    marker = os.path.join(dst, "_SUCCESS_LAYOUT")
    if not os.path.exists(marker):
        import shutil
        import uuid
        cleanup_at_exit(dst)
        staged = f"{dst}.staging.{uuid.uuid4().hex[:12]}"
        cleanup_at_exit(staged)
        compact_bm25_index(src, staged, spark=spark)
        open(os.path.join(staged, "_SUCCESS_LAYOUT"), "w").close()
        try:
            os.rename(staged, dst)
        except OSError:
            shutil.rmtree(staged, ignore_errors=True)
    q = query_terms(docs.filter(F.col("doc_id") < _N_QUERY_DOCS))
    return probe_bm25_index(q, dst, k=_TOPK)


# ------------------------------------------------------------------ #
# cross-encoder-style reranking over the hybrid candidate pool       #
# ------------------------------------------------------------------ #

# Feature weights of the reranker stand-in (exact integer linear
# model). The ordering mirrors what a real cross-encoder learns:
# phrase-level evidence (shared bigrams) dominates, then repeated-term
# mass, then mere vocabulary overlap, with a length-mismatch penalty.
_CE_W_BIGRAM = 1000
_CE_W_TF = 100
_CE_W_TERM = 10


@register(
    "cross_encoder_rerank",
    f"""
    WITH {_bm25_ctes(_POOL_K)},
    {_dense_ctes(_POOL_K)},
    pool AS (
      SELECT DISTINCT q_id, doc_id FROM (
        SELECT q_id, doc_id FROM bm25
        UNION ALL
        SELECT q_id, doc_id FROM dense) u
    ),
    tokarr AS (
      SELECT doc_id, {_tok_sql()} AS tk FROM documents
      WHERE length(trim(text)) > 0
    ),
    bgtf AS (
      SELECT doc_id, bg, COUNT(*) AS btf FROM (
        SELECT doc_id, tk[g.i] || ' ' || tk[g.i + 1] AS bg
        FROM tokarr, LATERAL (SELECT unnest(range(1, len(tk))) AS i) g
        WHERE len(tk) >= 2
      ) GROUP BY doc_id, bg
    ),
    qtf AS (
      SELECT doc_id AS q_id, term, tf FROM tf
      WHERE doc_id < {_N_QUERY_DOCS}
    ),
    uni AS (
      SELECT p.q_id, p.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_common,
             CAST(SUM(LEAST(q.tf, t.tf)) AS BIGINT) AS w_common
      FROM pool p
      JOIN qtf q ON q.q_id = p.q_id
      JOIN tf t ON t.doc_id = p.doc_id AND t.term = q.term
      GROUP BY p.q_id, p.doc_id
    ),
    bgq AS (
      SELECT doc_id AS q_id, bg, btf FROM bgtf
      WHERE doc_id < {_N_QUERY_DOCS}
    ),
    big AS (
      SELECT p.q_id, p.doc_id,
             CAST(SUM(LEAST(bq.btf, bt.btf)) AS BIGINT) AS w_big
      FROM pool p
      JOIN bgq bq ON bq.q_id = p.q_id
      JOIN bgtf bt ON bt.doc_id = p.doc_id AND bt.bg = bq.bg
      GROUP BY p.q_id, p.doc_id
    ),
    feat AS (
      SELECT p.q_id, p.doc_id,
             COALESCE(u.n_common, 0) AS n_common,
             COALESCE(u.w_common, 0) AS w_common,
             COALESCE(b.w_big, 0) AS w_big,
             ABS(CAST(COALESCE(dq_len.dl, 0) AS BIGINT)
                 - CAST(COALESCE(dd_len.dl, 0) AS BIGINT)) AS dl_diff
      FROM pool p
      LEFT JOIN uni u ON u.q_id = p.q_id AND u.doc_id = p.doc_id
      LEFT JOIN big b ON b.q_id = p.q_id AND b.doc_id = p.doc_id
      LEFT JOIN dl dq_len ON dq_len.doc_id = p.q_id
      LEFT JOIN dl dd_len ON dd_len.doc_id = p.doc_id
    )
    SELECT q_id, doc_id, ce_score, ce_rank FROM (
      SELECT q_id, doc_id,
             CAST({_CE_W_BIGRAM} * w_big + {_CE_W_TF} * w_common
                  + {_CE_W_TERM} * n_common - dl_diff AS BIGINT)
               AS ce_score,
             row_number() OVER (
               PARTITION BY q_id
               ORDER BY {_CE_W_BIGRAM} * w_big + {_CE_W_TF} * w_common
                        + {_CE_W_TERM} * n_common - dl_diff DESC,
                        doc_id) AS ce_rank
      FROM feat)
    WHERE ce_rank <= {_TOPK}
    """,
    doc="Cross-encoder-style reranking stand-in: the hybrid candidate "
        "pool (BM25 top-20 UNION dense top-20 per seed) is re-scored "
        "by JOINT query-document features — shared-bigram mass "
        "(Σ min(btf_q, btf_d), the phrase-evidence a cross-encoder "
        "attends to), repeated-term mass (Σ min(tf_q, tf_d)), distinct "
        "vocabulary overlap, and a |dl_q - dl_d| length-mismatch "
        "penalty — combined by an exact integer linear model so the "
        "score itself gates (no float, no ln). This is the standard "
        "retrieve-then-rerank serving shape: the first stage bounds "
        "candidates (<= 2*pool per query), so the expensive pairwise "
        "feature pass is (n_queries x 40) pairs, NEVER corpus-scale. "
        "Spark prunes the tokenize/explode feature pipeline to "
        "query+candidate docs via a broadcast semi-join BEFORE any "
        "explode — at 100 TB the reranker costs the same as at 1 GB "
        "once the pool is fixed; a learned model would swap the "
        "integer weights for a Pandas-UDF batch without changing the "
        "plan shape.",
)
def cross_encoder_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cache import track
    pool = track(
        _bm25_ranked(spark, sf_dir, _POOL_K).select("q_id", "doc_id")
        .unionByName(_dense_ranked(spark, sf_dir, _POOL_K)
                     .select("q_id", "doc_id"))
        .distinct().persist())
    pool_docs = pool.select("doc_id").distinct()
    base = _tokenized_base(spark, sf_dir)
    # feature extraction touches ONLY query + candidate docs: the
    # semi-join prunes before tokenization explodes anything
    rel = track(
        base.join(F.broadcast(pool_docs), "doc_id", "left_semi")
            .unionByName(base.filter(F.col("doc_id") < _N_QUERY_DOCS))
            .dropDuplicates(["doc_id"]).persist())
    tf = track(rel.select("doc_id", F.explode("toks").alias("term"))
                  .groupBy("doc_id", "term")
                  .agg(F.count("*").alias("tf")).persist())
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    bg = track(rel.filter(F.size("toks") >= 2)
                  .select("doc_id", F.explode(F.expr(
                      "transform(sequence(1, size(toks) - 1), "
                      "i -> concat(toks[i-1], ' ', toks[i]))")).alias("bg"))
                  .groupBy("doc_id", "bg")
                  .agg(F.count("*").alias("btf")).persist())
    qtf = (tf.filter(F.col("doc_id") < _N_QUERY_DOCS)
             .select(F.col("doc_id").alias("q_id"), "term",
                     F.col("tf").alias("qtf")))
    uni = (pool.join(F.broadcast(qtf), "q_id")
               .join(tf.withColumnRenamed("tf", "dtf"), ["doc_id", "term"])
               .groupBy("q_id", "doc_id")
               .agg(F.count("*").alias("n_common"),
                    F.sum(F.least("qtf", "dtf")).alias("w_common")))
    bgq = (bg.filter(F.col("doc_id") < _N_QUERY_DOCS)
             .select(F.col("doc_id").alias("q_id"), "bg",
                     F.col("btf").alias("qbtf")))
    bigf = (pool.join(F.broadcast(bgq), "q_id")
                .join(bg.withColumnRenamed("btf", "dbtf"), ["doc_id", "bg"])
                .groupBy("q_id", "doc_id")
                .agg(F.sum(F.least("qbtf", "dbtf")).alias("w_big")))
    dlq = dl.select(F.col("doc_id").alias("q_id"), F.col("dl").alias("dlq"))
    dld = dl.select("doc_id", F.col("dl").alias("dld"))
    feat = (pool.join(uni, ["q_id", "doc_id"], "left")
                .join(bigf, ["q_id", "doc_id"], "left")
                .join(F.broadcast(dlq), "q_id", "left")
                .join(F.broadcast(dld), "doc_id", "left")
                .select("q_id", "doc_id",
                        F.coalesce("n_common", F.lit(0)).alias("n_common"),
                        F.coalesce("w_common", F.lit(0)).alias("w_common"),
                        F.coalesce("w_big", F.lit(0)).alias("w_big"),
                        F.abs(F.coalesce("dlq", F.lit(0))
                              - F.coalesce("dld", F.lit(0)))
                         .alias("dl_diff")))
    score = (F.lit(_CE_W_BIGRAM) * F.col("w_big")
             + F.lit(_CE_W_TF) * F.col("w_common")
             + F.lit(_CE_W_TERM) * F.col("n_common")
             - F.col("dl_diff")).cast("long")
    w = Window.partitionBy("q_id").orderBy(F.desc("ce_score"),
                                           F.asc("doc_id"))
    return (feat.withColumn("ce_score", score)
                .withColumn("ce_rank", F.row_number().over(w))
                .filter(F.col("ce_rank") <= _TOPK)
                .select("q_id", "doc_id", "ce_score", "ce_rank"))
