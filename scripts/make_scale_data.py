#!/usr/bin/env python3
"""Synthesize the deterministic scale-stress copy of the driver
testdata (VERDICT r2 task #2): N key-shifted replicas of every table,
written as MULTI-FILE, MULTI-ROW-GROUP parquet — the antidote to
BASELINE.md's caveat that every sf0.1 scan is one single-row-group
task and therefore one Spark task.

Replica construction (pure function of the input — no RNG, fully
deterministic):

- replica 0 is the original data byte-for-byte (so fixed query sets
  like ``vec_id < 10`` and the IVF centroid ids keep resolving);
- replica r shifts every KEY column by r * 10_000_000 — each replica
  is a self-contained TPC-H world, so joins/groups scale output
  linearly instead of creating cross-replica key collisions;
- document text for r > 0 is token-remapped (every token prefixed
  ``q{r}``) so replica corpora are disjoint in shingle space: dedup
  pair counts scale linearly by construction, they don't explode
  quadratically from 10 identical copies of every doc;
- events keep their timestamps (10x event density per window — the
  realistic load shape for window/sessionize operators).

Layout: each replica is appended as its own parquet files with a
1 MiB row-group target, so a 10x table is >= 10 files x several row
groups — real scan parallelism.

Usage: python scripts/make_scale_data.py [src_sf_dir] [dst_dir] [replicas]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from us_flight_delay_data_pipeline_spark.session import get_spark

OFFSET = 10_000_000

KEY_COLS = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey", "n_regionkey"],
    "customer": ["c_custkey", "c_nationkey"],
    "supplier": ["s_suppkey", "s_nationkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def replicate(spark, src: str, dst: str, replicas: int) -> None:
    os.makedirs(dst, exist_ok=True)
    for table, keys in KEY_COLS.items():
        base = spark.read.parquet(os.path.join(src, f"{table}.parquet"))
        out_path = os.path.join(dst, f"{table}.parquet")
        shutil.rmtree(out_path, ignore_errors=True)
        for r in range(replicas):
            df = base
            if r > 0:
                shift = r * OFFSET
                df = df.select(*[
                    (F.col(c) + F.lit(shift)).alias(c) if c in keys
                    else F.col(c) for c in df.columns])
                if table == "documents":
                    # disjoint token space per replica: prefix every
                    # token, keep token COUNT identical. Empty/blank
                    # text stays byte-identical (an unconditional
                    # concat would turn a 0-token doc into a 1-token
                    # doc in replicas, skewing per-replica token
                    # statistics).
                    df = (df.withColumn(
                              "text",
                              F.when(
                                  F.length(F.trim("text")) > 0,
                                  F.concat(F.lit(f"q{r}"),
                                           F.regexp_replace(
                                               "text", r"\s+", f" q{r}")))
                               .otherwise(F.col("text")))
                            .withColumn("n_chars", F.length("text")
                                        .cast("bigint")))
            n_parts = 4 if table not in ("region", "nation") else 1
            (df.repartition(n_parts)
               .write.mode("append")
               .option("parquet.block.size", 1 << 20)
               .parquet(out_path))
        files = [f for f in os.listdir(out_path) if f.endswith(".parquet")]
        print(f"{table}: {replicas}x -> {len(files)} files", flush=True)


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sg_scale10"
    replicas = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark()
    replicate(spark, src, dst, replicas)
    print(f"done: {dst}")


if __name__ == "__main__":
    main()
