"""Local replica of the driver's oracle gate: run every queries() entry and
compare against oracle_sql() via DuckDB (row count + schema + values)."""
import duckdb
import pandas as pd
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _to_pandas(obj):
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    if isinstance(obj, pd.DataFrame):
        return obj
    return obj.to_pandas()  # ray Dataset


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


@pytest.fixture(scope="module")
def contract():
    import __ray_entry__ as e
    return e.queries(), e.oracle_sql()


def test_every_oracle_key_has_query(contract):
    queries, oracles = contract
    assert set(oracles) <= set(queries)


@pytest.mark.usefixtures("ray_session")
def test_queries_match_oracle(contract, oracle_con):
    queries, oracles = contract
    failures = []
    for name, sql in oracles.items():
        got = _normalize(_to_pandas(queries[name](SF_DIR)))
        exp = _normalize(oracle_con.execute(sql).fetchdf())
        if list(got.columns) != list(exp.columns):
            failures.append(f"{name}: columns {list(got.columns)} != {list(exp.columns)}")
            continue
        if len(got) != len(exp):
            failures.append(f"{name}: rows {len(got)} != {len(exp)}")
            continue
        for col in got.columns:
            a, b = got[col], exp[col].astype(got[col].dtype, errors="ignore") \
                if hasattr(exp[col], "astype") else exp[col]
            try:
                pd.testing.assert_series_equal(
                    got[col], exp[col], check_dtype=False, check_names=False,
                    check_exact=True,
                )
            except AssertionError:
                failures.append(f"{name}: column {col} values differ")
                break
    assert failures == [], "\n".join(failures)


@pytest.mark.usefixtures("ray_session")
def test_rows_only_queries_run(contract):
    """Queries without an oracle must still run and return rows."""
    queries, oracles = contract
    for name in set(queries) - set(oracles):
        out = queries[name](SF_DIR)
        if hasattr(out, "count") and not isinstance(out, (pa.Table, pd.DataFrame)):
            assert out.count() > 0, name
        else:
            assert len(_to_pandas(out)) > 0, name


@pytest.mark.usefixtures("ray_session")
def test_entry_smoke():
    import __ray_entry__ as e
    out = e.entry()
    n = out.count() if hasattr(out, "count") else len(out)
    assert n > 0
