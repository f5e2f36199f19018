from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"
SF01 = "/root/testdata/sf0.1"

FIXTURE_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="session")
def spark():
    from fastmorph_spark.session import get_spark

    s = get_spark(master="local[8]", shuffle_partitions=16, app_name="fastmorph-tests")
    yield s


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the fixture views registered, mirroring the
    driver's oracle harness (sf-qualified view names: {table}; use
    duck_for(sf_dir))."""
    import duckdb

    return duckdb.connect()


def register_views(con, sf_dir: str) -> None:
    for t in FIXTURE_TABLES:
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")


def assert_frames_match(spark_df, duck_rel, float_rtol: float = 1e-9) -> None:
    """Local replica of the driver's compare: row-count + schema-by-name +
    order-insensitive values (floats with tolerance; driver hashes exactly,
    which our SCORE_DECIMALS rounding makes safe)."""
    sp = spark_df.toPandas()
    du = duck_rel.df()
    assert sorted(sp.columns) == sorted(du.columns), (sorted(sp.columns), sorted(du.columns))
    cols = sorted(sp.columns)
    sp = sp[cols]
    du = du[cols]
    assert len(sp) == len(du), f"row count {len(sp)} != {len(du)}"
    key_cols = [c for c in cols]
    sp = sp.sort_values(key_cols, kind="mergesort").reset_index(drop=True)
    du = du.sort_values(key_cols, kind="mergesort").reset_index(drop=True)
    for c in cols:
        a, b = sp[c], du[c]
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            np.testing.assert_allclose(
                a.astype(float).to_numpy(), b.astype(float).to_numpy(),
                rtol=float_rtol, atol=1e-12, err_msg=f"column {c}",
            )
        else:
            mism = (a.astype(object).to_numpy() != b.astype(object).to_numpy())
            assert not mism.any(), f"column {c}: {sp[mism].head()} vs {du[mism].head()}"
