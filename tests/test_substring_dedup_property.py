"""Property-based check of substring_dedup (hypothesis): randomized
corpora built from unique tokens with randomly planted verbatim
copies must satisfy the operator's invariants — every planted copy of
length >= L is fully covered, docs built purely of unique tokens are
never flagged, and coverage accounting is internally consistent."""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from us_flight_delay_data_pipeline_spark.queries.llm_ext import (
    _SUBSTR_L, substring_dedup)

# a planted scenario: (pad_before_a, pad_between, copy_len, pad_after_b)
SCENARIO = st.tuples(
    st.integers(min_value=0, max_value=6),
    st.integers(min_value=0, max_value=6),
    st.integers(min_value=_SUBSTR_L, max_value=2 * _SUBSTR_L + 3),
    st.integers(min_value=0, max_value=6),
)


def _uniq(prefix: str, n: int, start: int = 0) -> list[str]:
    return [f"{prefix}{start + i}" for i in range(n)]


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@pytest.mark.slow  # fast-profile exclusion (see pytest.ini)
@given(sc=SCENARIO)
def test_planted_copy_fully_covered(spark, tmp_path_factory, sc):
    pad_a, pad_mid, copy_len, pad_b = sc
    shared = _uniq("s", copy_len)
    # doc 0: pad, copy; doc 1: different pad, copy, different pad —
    # all pads draw from disjoint token namespaces, so the ONLY
    # duplicated windows are inside the planted copy
    d0 = " ".join(_uniq("a", pad_a) + shared)
    d1 = " ".join(_uniq("b", pad_mid) + shared + _uniq("c", pad_b))
    d2 = " ".join(_uniq("z", 3 * _SUBSTR_L))  # pure-unique control
    root = tmp_path_factory.mktemp("ssd")
    rows = [(i, t, "en", "f", len(t)) for i, t in enumerate([d0, d1, d2])]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, "
              "n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(root / "documents.parquet"))

    out = {r.doc_id: r for r in substring_dedup(spark, str(root)).collect()}
    # control doc never flagged
    assert 2 not in out
    n_windows = copy_len - _SUBSTR_L + 1
    for doc, pad in ((0, pad_a), (1, pad_mid)):
        r = out[doc]
        # exactly the copy's windows are duplicated, merged into one
        # span covering exactly the planted tokens
        assert r.n_dup_windows == n_windows
        assert r.n_spans == 1
        assert r.n_dup_tokens == copy_len
        assert r.max_span_tokens == copy_len
        assert r.first_dup_pos == pad + 1
        # accounting invariants
        assert r.n_dup_tokens <= r.n_tokens
        assert 0.0 < r.dup_ratio <= 1.0
