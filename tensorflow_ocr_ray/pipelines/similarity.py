"""Similarity search over the ``embeddings`` table (list<float> vectors).

- ``ann_topk_brute``  — exact cosine top-k: numpy matmul per batch against
  a broadcast query vector; the baseline every ANN variant is measured
  against, and the SQL-oracle-checkable entry.
- ``ann_topk_lsh``    — random-hyperplane LSH bucketing: probes only the
  query's bucket ring instead of scanning everything; the scale path
  (bucket = partition key at 100 TB).  Recall vs brute force is asserted
  in tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data as rd


def _emb(sf_dir: str) -> "rd.Dataset":
    return rd.read_parquet(f"{sf_dir}/embeddings.parquet")


def _query_vector(sf_dir: str, vec_id: int = 0) -> np.ndarray:
    import pyarrow.parquet as pq
    import pyarrow.compute as pc

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    mask = pc.equal(t.column("vec_id"), vec_id)
    row = t.filter(mask)
    return np.asarray(row.column("embedding")[0].as_py(), dtype=np.float64)


def ann_topk_brute(sf_dir: str, k: int = 10, query_vec_id: int = 0) -> pd.DataFrame:
    """Exact cosine top-k, streaming: per-batch local top-k then a driver
    merge of ≤ k·num_batches rows (never materializes similarities for the
    whole corpus)."""
    q = _query_vector(sf_dir, query_vec_id)
    qn = q / np.linalg.norm(q)
    q_ref = ray.put(qn)

    class Score:
        def __init__(self, ref, k):
            self.q = ray.get(ref)
            self.k = k

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(m, axis=1)
            norms[norms == 0] = 1.0
            sims = (m @ self.q) / norms
            out = pd.DataFrame(
                {"vec_id": df["vec_id"].values, "sim": np.round(sims, 4)}
            )
            out = out[out["vec_id"] != query_vec_id]
            return out.sort_values(
                ["sim", "vec_id"], ascending=[False, True]
            ).head(self.k)

    tops = _emb(sf_dir).map_batches(
        Score,
        fn_constructor_kwargs={"ref": q_ref, "k": k},
        batch_format="pandas",
        batch_size=4096,
        concurrency=2,
    ).to_pandas()
    tops = tops.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
    return tops.reset_index(drop=True).astype({"vec_id": "int64"})


def ann_topk_lsh(
    sf_dir: str,
    k: int = 10,
    query_vec_id: int = 0,
    n_planes: int = 8,
    probes: int = 3,
    seed: int = 11,
) -> pd.DataFrame:
    """LSH-bucketed ANN: sign-of-projection bucket codes; search the query
    bucket plus its ``probes`` nearest Hamming-neighbor buckets."""
    q = _query_vector(sf_dir, query_vec_id)
    dim = q.shape[0]
    rng = np.random.Generator(np.random.PCG64(seed))
    planes = rng.normal(size=(n_planes, dim))
    q_code = int(((planes @ q) > 0).astype(np.uint32) @ (1 << np.arange(n_planes)))
    # candidate buckets: exact code, then codes at hamming distance 1..,
    # until `probes` bucket-flips are allowed
    cand_codes = {q_code}
    for flip in range(n_planes):
        cand_codes.add(q_code ^ (1 << flip))
    planes_ref = ray.put(planes)
    qn = q / np.linalg.norm(q)
    q_ref = ray.put(qn)
    codes_ref = ray.put(cand_codes)

    class BucketScore:
        def __init__(self):
            self.planes = ray.get(planes_ref)
            self.q = ray.get(q_ref)
            self.codes = ray.get(codes_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
            codes = ((m @ self.planes.T) > 0).astype(np.uint32) @ (
                1 << np.arange(self.planes.shape[0])
            )
            keep = np.array([c in self.codes for c in codes])
            keep &= df["vec_id"].to_numpy() != query_vec_id
            if not keep.any():
                return pd.DataFrame({"vec_id": [], "sim": []})
            m = m[keep]
            norms = np.linalg.norm(m, axis=1)
            norms[norms == 0] = 1.0
            sims = (m @ self.q) / norms
            return pd.DataFrame(
                {
                    "vec_id": df["vec_id"].to_numpy()[keep],
                    "sim": np.round(sims, 4),
                }
            )

    scored = _emb(sf_dir).map_batches(
        BucketScore, batch_format="pandas", batch_size=4096, concurrency=2
    ).to_pandas()
    out = scored.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
    return out.reset_index(drop=True).astype({"vec_id": "int64"})


def embedding_dup_pairs(sf_dir: str, threshold: float = 0.4) -> pd.DataFrame:
    """Embedding-cosine near-duplicate pairs (SQL-oracle-checkable).

    Scale shape: per-batch normalization + a driver-side blocked matmul of
    the normalized matrix (500xD here).  At 100 TB the same op becomes
    LSH-bucketed (``ann_topk_lsh``'s codes as the partition key) so only
    same-bucket blocks multiply."""
    ds = _emb(sf_dir)

    def normalize(df: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0] = 1.0
        return pd.DataFrame(
            {"vec_id": df["vec_id"].values, "normed": list(m / n)}
        )

    parts = (
        ds.map_batches(normalize, batch_format="pandas")
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    ids = parts["vec_id"].to_numpy()
    m = np.stack(parts["normed"].to_numpy())
    sims = m @ m.T
    ia, ib = np.nonzero(np.triu(sims >= threshold, k=1))
    order = np.lexsort((ids[ib], ids[ia]))
    ia, ib = ia[order], ib[order]
    return pd.DataFrame(
        {
            "vec_a": ids[ia].astype("int64"),
            "vec_b": ids[ib].astype("int64"),
            "sim": np.round(sims[ia, ib], 4),
        }
    )


def label_centroids(sf_dir: str) -> pd.DataFrame:
    """Per-label count + mean of the first embedding dim (SQL-checkable)."""
    from ray.data.aggregate import Count, Mean

    def first_dim(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "label": df["label"],
                "dim0": [float(e[0]) for e in df["embedding"]],
            }
        )

    df = (
        _emb(sf_dir)
        .map_batches(first_dim, batch_format="pandas")
        .groupby("label")
        .aggregate(Count(alias_name="n"), Mean("dim0", alias_name="m"))
        .to_pandas()
    )
    return pd.DataFrame(
        {
            "label": df["label"],
            "n": df["n"].astype("int64"),
            "mean_dim0": df["m"].round(4),
        }
    )


def ann_topk_ivf(
    sf_dir: str,
    k: int = 10,
    query_vec_id: int = 0,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 23,
    kmeans_iters: int = 10,
) -> pd.DataFrame:
    """IVF ANN: k-means coarse cells trained on a driver-side sample,
    centroids broadcast; each batch assigns its vectors and scores only
    those in the query's n_probe nearest cells (cell id = partition key
    at 100 TB)."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    sample = np.stack(
        [np.asarray(e, dtype=np.float64) for e in
         t.column("embedding").to_pylist()[: 4096]]
    )
    rng = np.random.Generator(np.random.PCG64(seed))
    cents = sample[rng.choice(len(sample), size=n_cells, replace=False)]
    for _ in range(kmeans_iters):  # deterministic Lloyd iterations
        d = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for c in range(n_cells):
            members = sample[assign == c]
            if len(members):
                cents[c] = members.mean(0)
    q = _query_vector(sf_dir, query_vec_id)
    qn = q / np.linalg.norm(q)
    probe_cells = set(
        np.argsort(((cents - q) ** 2).sum(1))[:n_probe].tolist()
    )
    cents_ref = ray.put(cents)
    q_ref = ray.put(qn)
    cells_ref = ray.put(probe_cells)

    class CellScore:
        def __init__(self):
            self.cents = ray.get(cents_ref)
            self.q = ray.get(q_ref)
            self.cells = ray.get(cells_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
            d = ((m[:, None, :] - self.cents[None, :, :]) ** 2).sum(-1)
            keep = np.isin(d.argmin(1), list(self.cells))
            keep &= df["vec_id"].to_numpy() != query_vec_id
            if not keep.any():
                return pd.DataFrame({"vec_id": [], "sim": []})
            m = m[keep]
            norms = np.linalg.norm(m, axis=1)
            norms[norms == 0] = 1.0
            sims = (m @ self.q) / norms
            return pd.DataFrame(
                {"vec_id": df["vec_id"].to_numpy()[keep],
                 "sim": np.round(sims, 4)}
            )

    scored = _emb(sf_dir).map_batches(
        CellScore, batch_format="pandas", batch_size=4096, concurrency=2
    ).to_pandas()
    out = scored.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
    return out.reset_index(drop=True).astype({"vec_id": "int64"})
