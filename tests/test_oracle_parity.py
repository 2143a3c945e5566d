"""Oracle parity: every SQL-oracled query key hash-matches DuckDB.

This is the local mirror of the driver's t2 gate — a key is only
declared in the registry once it passes here (SURVEY.md §0 item 4).
"""

from __future__ import annotations

import pytest

from processor_spark import registry
from tests.conftest import SF_ORACLE
from tests.oracle_utils import compare, run_oracle

registry.load_all_modules()
_SQL_KEYS = sorted(registry.oracle_sql())
_ROWS_ONLY_KEYS = sorted(set(registry.queries()) - set(_SQL_KEYS))


@pytest.mark.parametrize("key", _SQL_KEYS)
def test_sql_oracle_parity(spark, key):
    q = registry.get(key)
    res = compare(q.fn(spark, SF_ORACLE), run_oracle(q.sql, SF_ORACLE))
    assert res["rows_match"], f"{key}: row counts {res['rows_spark']} != {res['rows_oracle']}"
    assert res["cols_match"], f"{key}: columns {res['cols_spark']} != {res['cols_oracle']}"
    assert res["values_match"], f"{key}: value mismatch {res.get('first_diffs')}"


# rows-only keys that must still produce output on the fixtures — an
# empty result would mean a silently broken operator, not a weak check
# (q_dedup_embed legitimately returns 0 pairs: no cos>=0.99 duplicates
# exist in the synthetic embeddings)
_MUST_BE_NONEMPTY = {
    "q_agg_approx",
    "q_percentiles",
    "q_dedup_minhash",
    "q_dedup_near",
    "q_simhash",
    "q_media_features",
    "q_udf_normalize",
    "q_udtf_ngrams",
    "q_ann_ml",
    "q_sample",
    "q_sample_stratified",
}


@pytest.mark.parametrize("key", _ROWS_ONLY_KEYS)
def test_rows_only_queries_run(spark, key):
    q = registry.get(key)
    n = q.fn(spark, SF_ORACLE).count()
    if key in _MUST_BE_NONEMPTY:
        assert n > 0, f"{key}: rows-only query returned an empty result"
    else:
        assert n >= 0
