"""Oracle parity for EXTRA_QUERIES — operators retired from the
50-row driver registry but still first-class library surface
(queries.py EXTRA_QUERIES), checked here against DuckDB at sf0.001
with the same compare the driver uses (row count, sorted column
names, order-insensitive value hash)."""

import hashlib

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = []
    for _, row in df.iterrows():
        parts = []
        for v in row:
            if isinstance(v, (float, np.floating)):
                parts.append(repr(float(v)))
            else:
                parts.append(str(v))
        rows.append("\x1f".join(parts))
    rows.sort()
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def _extra_names():
    from web_scraping_script_ray.pipelines.queries import EXTRA_QUERIES

    return sorted(EXTRA_QUERIES)


@pytest.mark.parametrize("name", _extra_names())
def test_extra_query_parity(ray_session, duck, name):
    from web_scraping_script_ray.pipelines.queries import (
        EXTRA_ORACLE_SQL,
        EXTRA_QUERIES,
    )

    res = EXTRA_QUERIES[name](SF)
    mine = res.to_pandas() if hasattr(res, "to_pandas") else res
    oracle = duck.sql(EXTRA_ORACLE_SQL[name]).df()
    assert len(mine) == len(oracle), name
    assert sorted(mine.columns) == sorted(oracle.columns), name
    assert _value_hash(mine) == _value_hash(oracle), name


def test_registry_is_exactly_50():
    """The driver scores at most 50 registry rows (measured r02: 54
    registered → first 50 in insertion order got driver rows).  Keep
    the scored registry pinned at 50 so every registered query gets a
    correctness row; new operators go to EXTRA_QUERIES or displace a
    weaker entry."""
    from web_scraping_script_ray.pipelines.queries import (
        EXTRA_ORACLE_SQL,
        EXTRA_QUERIES,
        ORACLE_SQL,
        QUERIES,
    )

    assert len(QUERIES) == 50
    # ALL 50 registered queries are oracled (media_features gained its
    # golden-parquet oracle in r4)
    assert set(QUERIES) - set(ORACLE_SQL) == set()
    assert set(ORACLE_SQL) <= set(QUERIES)
    assert set(EXTRA_ORACLE_SQL) == set(EXTRA_QUERIES)
    assert not set(EXTRA_QUERIES) & set(QUERIES)
