"""hash_exchange == groupby(shard).map_groups for every fn shape the
repo routes through it, including empty shards and chained exchanges."""

import numpy as np
import pandas as pd


def _mk(n=5000, n_shards=16, seed=3):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "shard": rng.integers(0, n_shards, n),
            "k": rng.integers(0, 40, n),
            "v": rng.integers(-100, 100, n),
        }
    ).astype("int64")


def test_hash_exchange_matches_groupby(ray_session):
    import ray.data as rd
    from tensorflow_ocr_ray.stages.exchange import hash_exchange

    df = _mk()
    n_shards = 16

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("k", as_index=False).agg(s=("v", "sum"),
                                                 n=("v", "size"))
        return out.astype({"k": "int64", "s": "int64", "n": "int64"})

    ds = rd.from_pandas(df).repartition(7)
    got = hash_exchange(ds, "shard", n_shards, fn).to_pandas()
    want = (
        rd.from_pandas(df).repartition(7)
        .groupby("shard").map_groups(fn, batch_format="pandas")
        .to_pandas()
    )
    key = ["k", "s", "n"]
    g = got[key].sort_values(key).reset_index(drop=True)
    w = want[key].sort_values(key).reset_index(drop=True)
    assert g.equals(w)


def test_hash_exchange_empty_shards(ray_session):
    """Shards with zero rows still reach fn as an empty typed frame and
    produce empty output without breaking downstream datasets."""
    import ray.data as rd
    from tensorflow_ocr_ray.stages.exchange import hash_exchange

    df = _mk(n=50)
    df["shard"] = 0  # every row in shard 0; shards 1..31 empty

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"n": pd.Series([len(g)], dtype="int64")}
        ) if len(g) else pd.DataFrame({"n": pd.Series([], dtype="int64")})

    out = hash_exchange(rd.from_pandas(df), "shard", 32, fn).to_pandas()
    assert out["n"].tolist() == [50]


def test_hash_exchange_chained(ray_session):
    """Exchange -> map -> exchange (the tfidf/dup_span shape): the
    second exchange must survive schema-less empty blocks produced by
    the first one's empty shards."""
    import ray.data as rd
    from tensorflow_ocr_ray.stages.exchange import hash_exchange

    df = _mk(n=300)
    df["shard"] = df["shard"] % 2  # only shards 0,1 of 8 populated

    def ident(g: pd.DataFrame) -> pd.DataFrame:
        return g

    first = hash_exchange(rd.from_pandas(df), "shard", 8, ident)
    second = hash_exchange(
        first.map_batches(
            lambda d: d.assign(shard2=d["k"] % 4
                               if "k" in d.columns else d),
            batch_format="pandas",
        ),
        "shard2", 4,
        lambda g: g.groupby("shard2", as_index=False).agg(
            n=("v", "size")) if len(g) else g,
    ).to_pandas()
    assert int(second["n"].sum()) == 300
