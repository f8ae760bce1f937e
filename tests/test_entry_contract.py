"""Driver-contract consistency: every oracle has a query, every query
has an oracle unless explicitly rows-only, and the callables are
importable without a SparkSession."""

import __spark_entry__ as entry

#: empty since round 3: e3's iterative k-means training was split out
#: (frozen E3_CENTROIDS literals, tools/train_e3_centroids.py), making
#: the probe phase fully oracle-checkable — every query has a value oracle
ROWS_ONLY: set[str] = set()


def test_every_oracle_has_a_query():
    qs, os_ = set(entry.queries()), set(entry.oracle_sql())
    assert os_ <= qs, os_ - qs


def test_rows_only_set_is_exactly_the_documented_one():
    qs, os_ = set(entry.queries()), set(entry.oracle_sql())
    assert qs - os_ == ROWS_ONLY


def test_query_callables_are_callable():
    for name, fn in entry.queries().items():
        assert callable(fn), name
