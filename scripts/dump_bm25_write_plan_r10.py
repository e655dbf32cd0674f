#!/usr/bin/env python3
"""Dump the static plans of the three frames write_bm25_batch writes
(postings / df / stats) to plans/r10/bm25_write_<part>_<suffix>.txt.

Usage: python scripts/dump_bm25_write_plan_r10.py <suffix>

The write itself is an eager job, so the registered probe queries'
plans never show it; this mirrors scripts/dump_plan_r09.py's
bm25_tfdl_build dump but covers the pre-write repartition placement
(the r10 parallelism-cap fix).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from us_flight_delay_data_pipeline_spark.operators.bm25 import (
    N_TERM_BUCKETS, _tf_dl)
from us_flight_delay_data_pipeline_spark.operators.hashing import h32
from us_flight_delay_data_pipeline_spark.session import get_spark
from us_flight_delay_data_pipeline_spark.sources.registry import load_table


def main() -> None:
    suffix = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r10")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="dump_bm25_write_plan_r10")
    docs = load_table(spark, sf_dir, "documents")
    tfdl = _tf_dl(docs, "doc_id", "text")
    bid = F.lit(0).cast("bigint")
    # mirror the exact pre-write frames of write_bm25_batch (minus the
    # persist, which only changes InMemoryRelation wrapping)
    import us_flight_delay_data_pipeline_spark.operators.bm25 as bm25_mod
    src = open(bm25_mod.__file__).read()
    frames = {
        "postings": (tfdl.withColumn(
            "term_bucket",
            (h32(F.col("term")) % N_TERM_BUCKETS).cast("int"))
            .withColumn("batch_id", bid)),
        "df": (tfdl.groupBy("term").agg(F.count("*").alias("df"))
                   .withColumn("batch_id", bid)),
    }
    # apply whichever repartition the CURRENT source uses
    if 'repartition("term_bucket", "term")' in src:
        frames["postings"] = frames["postings"].repartition(
            "term_bucket", "term")
        frames["df"] = frames["df"].repartition("batch_id", "term")
    else:
        frames["postings"] = frames["postings"].repartition(
            "batch_id", "term_bucket")
        frames["df"] = frames["df"].repartition("batch_id")
    for part, df in frames.items():
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        path = os.path.join(out_dir, f"bm25_write_{part}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange)")


if __name__ == "__main__":
    main()
