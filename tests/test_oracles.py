"""Driver-style oracle checks run in-repo: the Ray pipeline and its
DuckDB oracle SQL must agree (rows + values) at sf0.001.  The driver
does this at sf0.01; this guards the oracles between rounds for the
entries most likely to drift (generated SQL with injected constants)."""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _run_oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    return con.execute(sql).fetchdf()


def test_minhash_verified_pairs_oracle(ray_session):
    import __ray_entry__ as e

    got = e.queries()["minhash_verified_pairs"](SF)
    if hasattr(got, "to_pandas"):
        got = got.to_pandas()
    orc = _run_oracle(e.oracle_sql()["minhash_verified_pairs"])
    got = got.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    orc = orc.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    assert len(got) > 0  # fixture corpus must actually contain near-dups
    assert len(got) == len(orc)
    assert (got["doc_a"].to_numpy() == orc["doc_a"].to_numpy()).all()
    assert (got["doc_b"].to_numpy() == orc["doc_b"].to_numpy()).all()
    # raw IEEE doubles on both sides -> bit-identical
    assert (got["sim"].to_numpy() == orc["sim"].to_numpy()).all()
