"""[EXT] fourth text-pipeline wave: corpus language-model scoring,
balanced stratified sampling, embedding compression, and dedup-recall
auditing.

These extend the training-data surface (SURVEY.md §0 north star) with
the operators a curation team runs between dedup and packing:

- ``bigram_lm_scores``: a corpus-trained bigram LM quality signal (the
  exact-integer stand-in for a KenLM perplexity filter; the unigram
  variant is ``doc_commonness``).
- ``balanced_stratified_sample``: data-derived per-stratum rates that
  equalize strata (vs ``deterministic_sample``'s fixed rates).
- ``int8_quantize_embeddings``: symmetric per-vector int8 codes — the
  4× memory cut applied before ANN serving.
- ``lsh_recall_audit``: measures MinHash-LSH candidate recall against
  the exact within-language Jaccard truth, per similarity decile —
  the audit you run before trusting approximate dedup at 100 TB.

Determinism policy (registry docstring): every cross-engine aggregate
is either an exact BIGINT sum of floor-quantized rationals or a single
final double division of exact integers — no float accumulation-order
exposure anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table
from . import register
from .llm_ext import _BAND_JOIN_SQL, _sig_cte_sql, _tok_sql, MINHASH_COEFFS, _BANDS

_LM_SCALE = 1_000_000_000  # conditional-probability quantum (1e-9)


@register(
    "bigram_lm_scores",
    f"""
    WITH base AS (
      SELECT doc_id, {_tok_sql()} AS toks
      FROM documents WHERE length(trim(text)) > 0
    ),
    bg AS (
      SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
      FROM base, unnest(range(1, len(toks))) AS u(i)
    ),
    doc_bg AS (SELECT doc_id, w1, w2, COUNT(*) AS k FROM bg GROUP BY ALL),
    c12 AS (SELECT w1, w2, CAST(SUM(k) AS BIGINT) AS c12 FROM doc_bg GROUP BY ALL),
    c1 AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM c12 GROUP BY w1),
    stats AS (SELECT w1, w2, (c12 * {_LM_SCALE}) // c1 AS q
              FROM c12 JOIN c1 USING (w1))
    SELECT doc_id,
           CAST(SUM(k) AS BIGINT) AS n_bigrams,
           CAST(SUM(k * q) AS BIGINT) AS score_q,
           (CAST(SUM(k * q) AS BIGINT)::DOUBLE
              / CAST(SUM(k) AS BIGINT)::DOUBLE) / {_LM_SCALE}.0 AS mean_cond_prob
    FROM doc_bg JOIN stats USING (w1, w2)
    GROUP BY doc_id
    """,
    doc="Bigram-LM quality scoring: train corpus bigram conditional "
        "probabilities P(w2|w1) = c(w1,w2)/c(w1·), then score each "
        "document by its mean conditional probability (low = "
        "unpredictable/noisy text, the KenLM-perplexity stand-in; "
        "high = fluent/templated). Exact across engines: each "
        "probability is floor-quantized to 1e-9 units as a BIGINT "
        "rational, summed exactly, divided once at the end. One "
        "explode pass builds (doc,w1,w2,k); the global c12/c1 tables "
        "derive from it by re-aggregation (map-side partials), so the "
        "token stream is scanned once, and the count tables — "
        "vocabulary-sized, not corpus-sized — join back by hash. "
        "Linear in corpus tokens at 100 TB. Overflow ceiling: "
        "c12 * 1e9 must stay under 2^63, i.e. the hottest single "
        "bigram may occur ~9e9 times — beyond a ~trillion-token "
        "corpus drop the quantum to 1e6 (same constant, BOTH "
        "engines) or lift q into DECIMAL(38,0).",
)
def bigram_lm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import word_tokens
    d = load_table(spark, sf_dir, "documents")
    base = (d.filter(F.length(F.trim("text")) > 0)
             .select("doc_id",
                     word_tokens(F.lower(F.col("text"))).alias("toks"))
             # >= 2 guards sequence(1, size-1), which would generate a
             # DESCENDING [1, 0] for single-token docs (oracle's
             # range(1, 1) is empty — same final rows either way)
             .filter(F.size("toks") >= 2))
    bg = (base.select(
            "doc_id",
            F.explode(F.expr(
                "transform(sequence(1, size(toks) - 1), "
                "i -> struct(toks[i-1] AS w1, toks[i] AS w2))")).alias("b"))
          .select("doc_id", "b.w1", "b.w2"))
    # one scan of the token stream; c12/c1 re-aggregate the persisted
    # per-doc counts instead of re-exploding the corpus
    doc_bg = (bg.groupBy("doc_id", "w1", "w2")
                .agg(F.count("*").alias("k"))
                .persist())
    c12 = doc_bg.groupBy("w1", "w2").agg(F.sum("k").alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    stats = (c12.join(c1, "w1")
                .select("w1", "w2",
                        F.expr(f"(c12 * {_LM_SCALE}) DIV c1").alias("q")))
    return (doc_bg.join(stats, ["w1", "w2"])
                  .groupBy("doc_id")
                  .agg(F.sum("k").cast("bigint").alias("n_bigrams"),
                       F.sum(F.col("k") * F.col("q")).cast("bigint")
                        .alias("score_q"))
                  .select("doc_id", "n_bigrams", "score_q",
                          ((F.col("score_q").cast("double")
                            / F.col("n_bigrams").cast("double"))
                           / F.lit(float(_LM_SCALE))).alias("mean_cond_prob")))


_SAMPLE_DEN = 1_000_000  # sampling-rate denominator


@register(
    "balanced_stratified_sample",
    f"""
    WITH counts AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
    tgt AS (SELECT MIN(n) AS m FROM counts),
    keyed AS (
      SELECT doc_id, lang,
             ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT
               % {_SAMPLE_DEN} AS r
      FROM documents
    )
    SELECT k.doc_id, k.lang, CAST(k.r AS BIGINT) AS r
    FROM keyed k JOIN counts USING (lang) CROSS JOIN tgt
    WHERE k.r * counts.n < tgt.m * {_SAMPLE_DEN}
    """,
    doc="Balanced stratified sampling: derive per-language keep rates "
        "min_count/count from the data itself so every stratum lands "
        "at the size of the smallest (the 'equalize languages' step of "
        "a corpus mix), then keep rows by deterministic hash. The "
        "acceptance test r*n < m*DEN is exact integer cross-"
        "multiplication — no float rate ever rounds differently "
        "between engines or runs. Per-stratum counts broadcast "
        "(|langs| rows); the sample itself is a map-side filter, so "
        "the plan is one small agg + one broadcast join at any scale.",
)
def balanced_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.hashing import h60
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count("*").alias("n"))
    tgt = counts.agg(F.min("n").alias("m"))
    keyed = d.select(
        "doc_id", "lang",
        (h60(F.col("doc_id").cast("string")) % _SAMPLE_DEN).alias("r"))
    return (keyed.join(F.broadcast(counts), "lang")
                 .crossJoin(F.broadcast(tgt))
                 .filter(F.col("r") * F.col("n") < F.col("m") * _SAMPLE_DEN)
                 .select("doc_id", "lang", F.col("r").cast("bigint").alias("r")))


_Q_ERR_SCALE = 1e12  # reconstruction-error quantum (1e-12)


@register(
    "int8_quantize_embeddings",
    f"""
    WITH q AS (
      SELECT vec_id,
             list_aggregate([abs(x::DOUBLE) for x in embedding], 'max') AS amax
      FROM embeddings
    ),
    sc AS (SELECT vec_id, amax, amax / 127.0 AS scale FROM q),
    codes AS (
      SELECT e.vec_id, s.amax, s.scale,
             CASE WHEN s.amax = 0
                  THEN [CAST(0 AS BIGINT) for x in e.embedding]
                  ELSE [CAST(floor(x::DOUBLE / s.scale + 0.5) AS BIGINT)
                        for x in e.embedding]
             END AS code
      FROM embeddings e JOIN sc s USING (vec_id)
    )
    SELECT c.vec_id,
           CAST(floor(c.scale * 1000000000 + 0.5) AS BIGINT) AS scale_q,
           array_to_string(c.code, ',') AS codes,
           CAST(list_sum([CAST(floor(
                  (e.embedding[i+1]::DOUBLE - c.code[i+1] * c.scale)
                * (e.embedding[i+1]::DOUBLE - c.code[i+1] * c.scale)
                * {_Q_ERR_SCALE} + 0.5) AS BIGINT)
              for i in range(0, len(c.code))]) AS BIGINT) AS err_q
    FROM codes c JOIN embeddings e USING (vec_id)
    """,
    doc="Symmetric per-vector int8 quantization (the 4x memory cut "
        "applied to an embedding corpus before ANN serving): scale = "
        "max|x|/127, code = floor(x/scale + 0.5), plus the exact "
        "reconstruction SSE per vector. Cross-engine exact: float to "
        "double casts are value-preserving, every per-element double "
        "op is identical IEEE arithmetic, the error sum is a BIGINT "
        "sum of floor-quantized 1e-12 units (orderless), and codes "
        "serialize to a csv string per the registry's array-output "
        "rule. Pure per-row map — no shuffle at any scale.",
)
def int8_quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.core import arr_str
    e = load_table(spark, sf_dir, "embeddings")
    xd = lambda x: x.cast("double")  # noqa: E731
    amax = F.array_max(F.transform("embedding", lambda x: F.abs(xd(x))))
    base = e.select("vec_id", "embedding", amax.alias("amax"),
                    (amax / F.lit(127.0)).alias("scale"))
    code = F.when(
        F.col("amax") == 0,
        F.transform("embedding", lambda x: F.lit(0).cast("bigint"))
    ).otherwise(
        F.transform("embedding",
                    lambda x: F.floor(xd(x) / F.col("scale") + F.lit(0.5))))
    with_codes = base.select("vec_id", "embedding", "scale",
                             code.alias("code"))
    err_terms = F.zip_with(
        "embedding", "code",
        lambda x, c: F.floor((xd(x) - c * F.col("scale"))
                             * (xd(x) - c * F.col("scale"))
                             * F.lit(_Q_ERR_SCALE) + F.lit(0.5)))
    return with_codes.select(
        "vec_id",
        F.floor(F.col("scale") * F.lit(1000000000.0) + F.lit(0.5))
         .cast("bigint").alias("scale_q"),
        arr_str("code").alias("codes"),
        F.aggregate(err_terms, F.lit(0).cast("bigint"),
                    lambda acc, t: acc + t).alias("err_q"))


@register(
    "length_curriculum",
    """
    WITH h AS (SELECT n_chars AS v, COUNT(*) AS c FROM documents GROUP BY 1),
    cum AS (
      SELECT v, SUM(c) OVER (ORDER BY v) AS cum, SUM(c) OVER () AS n FROM h
    ),
    b AS (
      SELECT MIN(CASE WHEN cum >= (n + 3) // 4 THEN v END) AS q1,
             MIN(CASE WHEN cum >= (n + 1) // 2 THEN v END) AS q2,
             MIN(CASE WHEN cum >= (3 * n + 3) // 4 THEN v END) AS q3
      FROM cum
    )
    SELECT CASE WHEN d.n_chars <= b.q1 THEN 0
                WHEN d.n_chars <= b.q2 THEN 1
                WHEN d.n_chars <= b.q3 THEN 2
                ELSE 3 END::INT AS bucket,
           COUNT(*)::BIGINT AS n_docs,
           CAST(MIN(d.n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(d.n_chars) AS BIGINT) AS max_chars,
           CAST(SUM(d.n_chars) AS BIGINT) AS total_chars
    FROM documents d CROSS JOIN b
    GROUP BY 1
    """,
    doc="Length-curriculum binning: EXACT document-length quartiles "
        "as order statistics (smallest value whose cumulative count "
        "reaches ceil(qN) — pure integer ranks, no interpolated "
        "percentile whose float formula could differ between "
        "engines), then every doc assigned its quartile bucket — the "
        "sequence-length curriculum / length-bucketed batching prep "
        "step. Scale shape: the cumulative count runs over the "
        "VALUE HISTOGRAM (bounded by the length domain, not corpus "
        "size) through operators/prefix.py's two-pass distributed "
        "prefix sum — no single-partition window — and the 1-row "
        "boundary table broadcasts into a map-side bucket assign.",
)
def length_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.prefix import with_global_running
    d = load_table(spark, sf_dir, "documents")
    h = d.groupBy("n_chars").agg(F.count("*").alias("c"))
    cum = with_global_running(h, [F.col("n_chars")], sum_col="c",
                              cum_name="cum", totals=True)
    bounds = cum.agg(
        F.expr("MIN(CASE WHEN cum >= (_sum_total + 3) DIV 4 "
               "THEN n_chars END) AS q1"),
        F.expr("MIN(CASE WHEN cum >= (_sum_total + 1) DIV 2 "
               "THEN n_chars END) AS q2"),
        F.expr("MIN(CASE WHEN cum >= (3 * _sum_total + 3) DIV 4 "
               "THEN n_chars END) AS q3"))
    bucket = (F.when(F.col("n_chars") <= F.col("q1"), 0)
               .when(F.col("n_chars") <= F.col("q2"), 1)
               .when(F.col("n_chars") <= F.col("q3"), 2)
               .otherwise(3))
    return (d.crossJoin(F.broadcast(bounds))
             .select(bucket.alias("bucket"), "n_chars")
             .groupBy("bucket")
             .agg(F.count("*").cast("bigint").alias("n_docs"),
                  F.min("n_chars").cast("bigint").alias("min_chars"),
                  F.max("n_chars").cast("bigint").alias("max_chars"),
                  F.sum("n_chars").cast("bigint").alias("total_chars")))


@register(
    "lsh_recall_audit",
    f"""
    WITH {_sig_cte_sql()},
    hn AS (
      SELECT s.doc_id, d.lang, s.hsd, len(s.hsd) AS n
      FROM sig s JOIN documents d USING (doc_id)
    ),
    truth AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             len(list_intersect(a.hsd, b.hsd))::DOUBLE
               / (a.n + b.n - len(list_intersect(a.hsd, b.hsd)))::DOUBLE
               AS jaccard
      FROM hn a JOIN hn b ON a.lang = b.lang AND a.doc_id < b.doc_id
       AND least(a.n, b.n)::DOUBLE >= 0.3 * greatest(a.n, b.n)::DOUBLE
      WHERE len(list_intersect(a.hsd, b.hsd))::DOUBLE
               / (a.n + b.n - len(list_intersect(a.hsd, b.hsd)))::DOUBLE >= 0.3
    ),
    cand AS (SELECT DISTINCT doc_a, doc_b FROM ({_BAND_JOIN_SQL})),
    marked AS (
      SELECT t.jaccard, CASE WHEN c.doc_a IS NULL THEN 0 ELSE 1 END AS caught
      FROM truth t LEFT JOIN cand c
        ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b
    )
    SELECT CAST(floor(jaccard * 10) AS BIGINT) AS decile,
           COUNT(*)::BIGINT AS n_true,
           CAST(SUM(caught) AS BIGINT) AS n_caught,
           CAST(SUM(caught) AS BIGINT)::DOUBLE / COUNT(*)::DOUBLE AS recall
    FROM marked GROUP BY decile
    """,
    doc="LSH recall audit: exact within-language Jaccard pairs "
        "(threshold 0.3) as ground truth, per similarity decile, vs "
        "the MinHash-LSH (4x4 banding) candidate set — the measurement "
        "that tells you whether approximate dedup is safe to trust "
        "before you run it over 100 TB (banding theory: recall rises "
        "steeply with J; low deciles are expected misses). Truth uses "
        "the prefix-filtered exact join (linear in shared rare "
        "shingles), LSH the banded self-join — both scale-safe; the "
        "audit itself is a pair-key hash join + tiny agg.",
)
def lsh_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import (minhash_lsh_duplicate_pairs,
                                   ngram_jaccard_pairs)
    d = load_table(spark, sf_dir, "documents")
    truth = ngram_jaccard_pairs(d, block_col="lang", threshold=0.3)
    # verified LSH pairs: for truth rows (J >= 0.3) membership in the
    # verified set equals membership in the raw candidate set, so the
    # audit join is exact w.r.t. candidate recall
    lsh = (minhash_lsh_duplicate_pairs(d, MINHASH_COEFFS, bands=_BANDS,
                                       threshold=0.3)
           .select("doc_a", "doc_b", F.lit(1).alias("caught")))
    marked = (truth.join(lsh, ["doc_a", "doc_b"], "left")
                   .select("jaccard",
                           F.coalesce("caught", F.lit(0)).alias("caught")))
    return (marked.groupBy(F.floor(F.col("jaccard") * 10).cast("bigint")
                            .alias("decile"))
                  .agg(F.count("*").cast("bigint").alias("n_true"),
                       F.sum("caught").cast("bigint").alias("n_caught"))
                  .select("decile", "n_true", "n_caught",
                          (F.col("n_caught").cast("double")
                           / F.col("n_true").cast("double")).alias("recall")))
