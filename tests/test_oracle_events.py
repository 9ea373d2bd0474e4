"""Oracle-backed regression net for the event-time / streaming family.

Round 2 shipped st2/st5 answers that were 1000× wrong while pytest stayed
green, because those tests synthesized their own timestamp frames — the real
``events.parquet`` physical type (TIMESTAMP(NANOS)-as-long vs µs
TIMESTAMP_NTZ, which differs by environment) never flowed through CI. This
module closes that gap: every ``ev*`` / ``st*`` entry in ``queries()`` runs
against the actual testdata parquet and is compared to its DuckDB
``oracle_sql()`` — same protocol as the driver's correctness gate (sorted
columns, sorted rows, normalised floats/bytes/datetimes).
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from tools.check_oracle import TABLES, compare  # noqa: E402

_EVENT_QUERIES = sorted(
    name
    for name in entrymod.queries()
    if name.startswith(("ev", "st")) and entrymod.oracle_sql().get(name)
)


@pytest.fixture(scope="module")
def oracle_con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


def test_event_family_is_covered():
    # the net must actually contain the queries it exists to pin
    for expected in (
        "ev1_hourly_window_agg",
        "ev2_sessionize",
        "ev5_asof_join",
        "ev6_range_join",
        "st2_streaming_sessions",
        "st5_stream_stream_join",
    ):
        assert expected in _EVENT_QUERIES


@pytest.mark.parametrize("name", _EVENT_QUERIES)
def test_event_query_matches_oracle(spark, sf_dir, oracle_con, name):
    fn = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    spark_pdf = fn(spark, sf_dir).toPandas()
    oracle_pdf = oracle_con.execute(sql).fetchdf()
    diff = compare(spark_pdf, oracle_pdf)
    assert diff is None, f"{name}: {diff}"
