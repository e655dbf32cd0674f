"""Named query registry — the driver-facing surface.

Every operator from SURVEY.md §2 (plus the [EXT] LLM-pipeline
operators) is exposed as a named query over the driver testdata
tables, each paired with an ANSI-SQL oracle for the DuckDB
differential harness (SURVEY.md §5 strategy 1).

Numeric-parity policy (why the decimal casts everywhere): Spark and
DuckDB sum doubles in different orders, so raw double aggregates can
drift in the last bits and break value-hash comparison. We therefore
sum through ``DECIMAL(38,6)`` — casting the *same* input double to
decimal rounds identically in both engines (no representable exact
ties at the half-ulp), decimal addition is exact, and the final cast
back to double is deterministic. Ratios of exact sums are then
bit-identical too. Averages are computed as exact-sum/count, never via
the engines' ``avg``.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""
    # Calibration/tuning audits (parameter sweeps, recall
    # measurements) are not serving queries — bench totals report
    # them separately so the serving number is not inflated by
    # one-off calibration work.
    audit: bool = False


# Queries that exist to CALIBRATE other operators (band-count sweeps,
# recall measurement against brute force, corpus-overlap audits) —
# run once per corpus/parameter change, not per serving request.
# Tagged centrally so per-module QuerySpec rewrites (oracle
# attachment) cannot drop the flag.
AUDIT_QUERIES = frozenset({
    "minhash_band_tuning", "ivf_recall_audit", "lsh_recall_audit",
    "source_overlap_audit",
})


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc)
        return fn
    return deco


def load_registry() -> dict[str, QuerySpec]:
    """Import all query modules (side-effect: registration).

    Import order is rotated each round so the driver's fixed-size
    oracle sample (first 50 registered names) cycles through every
    query family over successive rounds rather than re-checking the
    same prefix.  Round 4 front-loads the families that had zero
    driver-side CORRECTNESS rows in rounds 1-3 (curation, graph,
    data-quality, transactions, streaming-gated, corpus/LM).
    """
    from . import curation_extra  # noqa: F401
    from . import curation_wave6  # noqa: F401
    from . import graph_and_index  # noqa: F401
    from . import data_quality  # noqa: F401
    from . import transactions  # noqa: F401
    from . import pretrain  # noqa: F401
    from . import corpus_lm  # noqa: F401
    from . import streaming_gated  # noqa: F401
    from . import udtf_surface  # noqa: F401
    from . import text_pipeline  # noqa: F401
    from . import sessions_and_ann  # noqa: F401
    from . import multimodal_media  # noqa: F401
    from . import relational_extra  # noqa: F401
    from . import relational_wave3  # noqa: F401
    from . import relational_wave4  # noqa: F401
    from . import functions_coverage  # noqa: F401
    from . import llm_ext  # noqa: F401
    from . import relational  # noqa: F401
    for name in AUDIT_QUERIES & REGISTRY.keys():
        spec = REGISTRY[name]
        if not spec.audit:
            REGISTRY[name] = QuerySpec(fn=spec.fn, oracle=spec.oracle,
                                       doc=spec.doc, audit=True)
    return REGISTRY
