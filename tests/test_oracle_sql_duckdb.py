"""Every oracle_sql() entry must stay runnable DuckDB SQL — a syntax or
function regression (e.g. an xxhash64 sneaking in, a HUGEINT-typed sum)
should fail in seconds here, without waiting for the Spark-side gate."""

import math

import duckdb
import pytest

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"create view {t} as select * from '{SF_DIR}/{t}.parquet'")
    return c


def _oracle_items():
    import __spark_entry__ as em

    return sorted(em.oracle_sql().items())


@pytest.mark.parametrize("name,sql", _oracle_items())
def test_oracle_sql_runs_and_types(con, name, sql):
    rel = con.sql(sql)
    rows = rel.fetchall()
    # HUGEINT (int128) never appears — it breaks the driver's typed hash
    assert "INT128" not in str(rel.types) and "HUGEINT" not in str(rel.types), rel.types
    # every value is a canonical-hashable primitive
    for row in rows[:50]:
        for v in row:
            assert v is None or isinstance(v, (int, float, str, bool)), (name, type(v))
            if isinstance(v, float):
                assert not math.isinf(v)
