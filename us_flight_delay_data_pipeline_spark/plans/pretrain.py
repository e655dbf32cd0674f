"""The pretraining-data funnel — the [EXT] north-star workload
(BASELINE.json): compose the corpus operators into the standard
keep/drop pipeline and report the per-stage funnel every data team
publishes with a dataset release.

Stages (each operates on the previous stage's survivors):

  0 base       the raw corpus
  1 quality    heuristic quality gate (quality_score >= 0.5)
  2 exact      exact dedup — keep the lowest doc_id per md5(text)
  3 fuzzy      fuzzy dedup — near-dup pairs (n-gram Jaccard >= 0.3,
               lang-blocked) clustered by connected components; only
               cluster canonicals (min doc_id) survive
  4 decontam   drop the benchmark docs themselves (source='src0' is
               the stand-in holdout set) AND any training doc sharing
               a word-5-gram with the ORIGINAL benchmark set
  5 sample     deterministic per-language sampling
               (h32(doc_id) % 100 < rate[lang])

Scale shape: stages 1-2 are a map + one 16-byte-key shuffle; stage 3
is the bucketed pair join + iterative label propagation on the tiny
pair graph; stage 4 broadcasts the benchmark shingle set; stage 5 is
a pure map-side filter. Nothing materializes document text after its
stage no longer needs it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import quality_score, word_ngrams, word_tokens
from ..operators.components import connected_components
from ..operators.dedup import ngram_jaccard_pairs
from ..operators.hashing import h32

__all__ = ["pretrain_funnel", "SAMPLE_RATES", "QUALITY_MIN", "DECON_NGRAM"]

QUALITY_MIN = 0.5
DECON_NGRAM = 5
SAMPLE_RATES = {"en": 50, "zh": 20}  # default 10
_DEFAULT_RATE = 10


def _stage_row(df: DataFrame, idx: int, name: str) -> DataFrame:
    toks = word_tokens(F.lower(F.col("text")))
    return df.agg(
        F.lit(idx).alias("stage_idx"),
        F.lit(name).alias("stage"),
        F.count("*").alias("n_docs"),
        F.coalesce(F.sum(F.size(toks).cast("bigint")), F.lit(0))
         .alias("n_tokens"))


def pretrain_funnel(docs: DataFrame) -> DataFrame:
    """Run the funnel over a ``documents``-shaped DataFrame and return
    one row per stage: (stage_idx, stage, n_docs, n_tokens)."""
    from ..functions.core import rebalance

    # rebalance: the corpus arrives as few fat scan partitions (and
    # anti-join outputs get AQE-coalesced to one); the quality regexes
    # and shingle hashing are CPU-bound and need width, not bytes
    base = rebalance(docs.select("doc_id", "lang", "source", "text"))

    quality = base.filter(quality_score(F.col("text")) >= QUALITY_MIN) \
                  .persist()

    keep = quality.groupBy(
        F.md5(F.col("text").cast("binary")).alias("h")).agg(
        F.min("doc_id").alias("doc_id"))
    # each stage feeds both the next stage and its own funnel row, and
    # the funnel output unions six subtrees — persist the expensive
    # stage boundaries or every row recomputes the whole prefix
    # (Catalyst does not dedupe repeated subplans)
    exact = quality.join(keep.select("doc_id"), "doc_id", "left_semi") \
                   .persist()

    pairs = ngram_jaccard_pairs(exact, block_col="lang", threshold=0.3) \
        .select("doc_a", "doc_b")
    dupes = (connected_components(pairs, src="doc_a", dst="doc_b")
             .filter(F.col("node") != F.col("component"))
             .select(F.col("node").alias("doc_id")))
    fuzzy = exact.join(dupes, "doc_id", "left_anti").persist()

    # benchmark shingles come from the ORIGINAL corpus (the holdout
    # set is fixed; upstream filtering must not shrink it)
    def shingle_hashes(df: DataFrame) -> DataFrame:
        toks = word_tokens(F.lower(F.col("text")))
        return (rebalance(df.filter(F.size(toks) >= DECON_NGRAM))
                  .select("doc_id",
                          F.explode(F.array_distinct(F.transform(
                              word_ngrams(F.col("text"), DECON_NGRAM), h32)))
                           .alias("h")))

    bench = (shingle_hashes(base.filter(F.col("source") == "src0"))
             .select("h").distinct())
    contaminated = (shingle_hashes(fuzzy.filter(F.col("source") != "src0"))
                    .join(F.broadcast(bench), "h")
                    .select("doc_id").distinct())
    decontam = (fuzzy.filter(F.col("source") != "src0")
                     .join(contaminated, "doc_id", "left_anti")
                     .persist())

    rate = F.lit(_DEFAULT_RATE)
    for lang, r in sorted(SAMPLE_RATES.items()):
        rate = F.when(F.col("lang") == lang, r).otherwise(rate)
    sampled = decontam.filter(h32(F.col("doc_id").cast("string")) % 100 < rate)

    stages = [
        _stage_row(base, 0, "base"),
        _stage_row(quality, 1, "quality"),
        _stage_row(exact, 2, "exact_dedup"),
        _stage_row(fuzzy, 3, "fuzzy_dedup"),
        _stage_row(decontam, 4, "decontam"),
        _stage_row(sampled, 5, "sample"),
    ]
    out = stages[0]
    for s in stages[1:]:
        out = out.unionByName(s)
    return out
