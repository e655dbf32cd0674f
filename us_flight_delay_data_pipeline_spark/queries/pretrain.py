"""The pretraining-data funnel as an oracle-gated query: the full
stage-by-stage composition (quality gate -> exact dedup -> fuzzy
dedup clustering -> decontamination -> deterministic sampling) from
``plans/pretrain.py``, with a DuckDB oracle that re-derives every
stage — including the recursive-CTE connected components — so the
whole pipeline's keep/drop arithmetic is checked end to end, not
just its pieces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.registry import load_table
from . import register
from .llm_ext import STOPWORDS_SQL
from .text_pipeline import pairs_cte

_QUALITY_MIN = 0.5
_DECON_N = 5
_H32 = "('0x' || substr(md5({v}), 1, 15))::BIGINT % 4294967296"


def _funnel_sql() -> str:
    h = _H32
    gram = f"array_to_string(toks[i:i+{_DECON_N - 1}], ' ')"
    shingle5 = (f"list_distinct([{h.format(v=gram)} "
                f"for i in range(1, len(toks) - {_DECON_N - 2})])")
    stage = ("SELECT {i} AS stage_idx, '{n}' AS stage, COUNT(*) AS n_docs, "
             "COALESCE(SUM(len(toks)), 0)::BIGINT AS n_tokens FROM {t}")
    return f"""
    WITH RECURSIVE
    b0 AS (
      SELECT doc_id, lang, source, text,
             CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                  ELSE string_split_regex(trim(text), '\\s+') END AS toks,
             length(text) AS n
      FROM documents
    ),
    bq AS (
      SELECT *,
        0.4 * least(1.0, len(toks)::DOUBLE / 64.0)
        + 0.3 * (1.0 - CASE WHEN n = 0 THEN 0.0 ELSE
            (n - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))::DOUBLE / n::DOUBLE END)
        + 0.3 * least(1.0, 4.0 * CASE WHEN len(toks) = 0 THEN 0.0 ELSE
            len(list_filter(toks, x -> lower(x) IN {STOPWORDS_SQL}))::DOUBLE
              / len(toks)::DOUBLE END) AS quality
      FROM b0
    ),
    q AS (SELECT doc_id, lang, source, text, toks FROM bq
          WHERE quality >= {_QUALITY_MIN}),
    keepers AS (SELECT min(doc_id) AS doc_id FROM q GROUP BY md5(text)),
    e AS (SELECT q.* FROM q SEMI JOIN keepers USING (doc_id)),
    {pairs_cte('e')},
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION
      SELECT doc_b AS a, doc_a AS b FROM pairs
    ),
    reach(a, b) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, x.b FROM reach r JOIN edges x ON r.b = x.a
    ),
    dupes AS (
      SELECT a AS doc_id FROM reach GROUP BY a
      HAVING a <> least(a, min(b))
    ),
    f AS (SELECT e.* FROM e ANTI JOIN dupes USING (doc_id)),
    bench AS (
      SELECT DISTINCT unnest({shingle5}) AS h
      FROM (SELECT lower(text) AS ltext,
                   string_split_regex(trim(lower(text)), '\\s+') AS toks
            FROM b0 WHERE source = 'src0') t
      WHERE len(toks) >= {_DECON_N}
    ),
    ftrain AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
               FROM f WHERE source <> 'src0'),
    contaminated AS (
      SELECT DISTINCT t.doc_id
      FROM (SELECT doc_id, unnest({shingle5}) AS h
            FROM ftrain WHERE len(toks) >= {_DECON_N}) t
      SEMI JOIN bench USING (h)
    ),
    g AS (SELECT f.* FROM f ANTI JOIN contaminated USING (doc_id)
          WHERE source <> 'src0'),
    s AS (SELECT * FROM g
          WHERE {h.format(v='doc_id::VARCHAR')} % 100 <
                CASE lang WHEN 'en' THEN 50 WHEN 'zh' THEN 20 ELSE 10 END)
    {stage.format(i=0, n='base', t='b0')}
    UNION ALL {stage.format(i=1, n='quality', t='q')}
    UNION ALL {stage.format(i=2, n='exact_dedup', t='e')}
    UNION ALL {stage.format(i=3, n='fuzzy_dedup', t='f')}
    UNION ALL {stage.format(i=4, n='decontam', t='g')}
    UNION ALL {stage.format(i=5, n='sample', t='s')}
    """


@register(
    "pretrain_funnel",
    _funnel_sql(),
    doc="The flagship [EXT] composition: the whole pretraining-data "
        "funnel (quality gate -> exact dedup -> connected-components "
        "fuzzy dedup -> 5-gram decontamination -> deterministic "
        "sampling) reported as per-stage (n_docs, n_tokens). Every "
        "stage's keep/drop arithmetic is oracle-checked end to end — "
        "the integration test that the operators compose, not just "
        "pass individually. See plans/pretrain.py for the scale shape "
        "of each stage.",
)
def pretrain_funnel_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.pretrain import pretrain_funnel
    return pretrain_funnel(load_table(spark, sf_dir, "documents"))
