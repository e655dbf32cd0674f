"""Task-retry resilience: results must be EXACT when tasks fail and
are re-attempted — the everyday failure mode on a 1000-executor
cluster (preemptions, OOM kills, speculative duplicates) that local
green runs never exercise.

The shared session fixture runs local[N] with the default
task.maxFailures=1 (any task failure fails the job), so this test
spawns its own JVM with ``local[4, 3]`` (3 attempts per task) and
injects a deterministic first-attempt failure into every task of a
shuffle-feeding stage. Assertions: the job completes, and the result
is bit-identical to the no-failure run — no dropped rows, no
double-counted partials from the failed attempts.
"""

from __future__ import annotations

import subprocess
import sys
import textwrap

SCRIPT = textwrap.dedent("""
    import sys
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (SparkSession.builder.master("local[4, 3]")
             .appName("retry-probe")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .getOrCreate())

    def flaky(it):
        from pyspark import TaskContext
        ctx = TaskContext.get()
        if ctx.attemptNumber() == 0:
            raise RuntimeError("injected first-attempt failure")
        for pdf in it:
            yield pdf

    base = spark.range(0, 100_000, 1, 8).withColumn(
        "k", (F.col("id") % 97).cast("long"))

    expected = (base.groupBy("k").agg(F.sum("id").alias("s"),
                                      F.count("*").alias("n"))
                    .agg(F.sum("s").cast("long").alias("ts"),
                         F.sum("n").cast("long").alias("tn"))
                    .collect()[0])

    flaked = (base.mapInPandas(flaky, "id long, k long")
                  .groupBy("k").agg(F.sum("id").alias("s"),
                                    F.count("*").alias("n"))
                  .agg(F.sum("s").cast("long").alias("ts"),
                       F.sum("n").cast("long").alias("tn"))
                  .collect()[0])

    assert flaked.tn == expected.tn == 100_000, (flaked, expected)
    assert flaked.ts == expected.ts, (flaked, expected)
    print("RETRY_OK", flaked.ts, flaked.tn)
    spark.stop()
""")


def test_results_exact_under_task_retries():
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "RETRY_OK" in proc.stdout, proc.stdout
    # the injected failures actually happened (each of the 8 tasks
    # logged at least one failed attempt before succeeding)
    assert "injected first-attempt failure" in proc.stderr
