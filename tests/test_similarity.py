"""ANN variants: the bucketed/celled paths must find PLANTED near
neighbors (random-vector corpora have no true structure for LSH/IVF to
exploit, so recall there is luck; planted duplicates are the contract)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"
N_PLANTED = 5


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    """vec 0 = query; vecs 1..5 = query + tiny noise; 200 random others."""
    rng = np.random.Generator(np.random.PCG64(99))
    dim = 32
    q = rng.normal(size=dim)
    rows = [{"vec_id": 0, "embedding": q.tolist(), "label": "q"}]
    for i in range(1, N_PLANTED + 1):
        rows.append(
            {"vec_id": i,
             "embedding": (q + rng.normal(scale=0.01, size=dim)).tolist(),
             "label": "dup"}
        )
    for i in range(N_PLANTED + 1, N_PLANTED + 201):
        rows.append(
            {"vec_id": i, "embedding": rng.normal(size=dim).tolist(),
             "label": "noise"}
        )
    d = tmp_path_factory.mktemp("planted")
    pq.write_table(pa.Table.from_pylist(rows), str(d / "embeddings.parquet"))
    return str(d)


def _planted_recall(df) -> float:
    got = set(df["vec_id"]) & set(range(1, N_PLANTED + 1))
    return len(got) / N_PLANTED


def test_brute_finds_all_planted(ray_session, planted_dir):
    from tensorflow_ocr_ray.pipelines.similarity import ann_topk_brute

    df = ann_topk_brute(planted_dir, k=10)
    assert _planted_recall(df) == 1.0
    sims = df["sim"].tolist()
    assert sims == sorted(sims, reverse=True)
    assert 0 not in set(df["vec_id"])  # query excluded


def test_lsh_finds_planted(ray_session, planted_dir):
    from tensorflow_ocr_ray.pipelines.similarity import ann_topk_lsh

    df = ann_topk_lsh(planted_dir, k=10)
    assert _planted_recall(df) == 1.0  # near-dups share the query's bucket


def test_ivf_finds_planted(ray_session, planted_dir):
    from tensorflow_ocr_ray.pipelines.similarity import ann_topk_ivf

    df = ann_topk_ivf(planted_dir, k=10, n_cells=8, n_probe=2)
    assert _planted_recall(df) == 1.0  # near-dups share the query's cell


def test_brute_real_table_shape(ray_session):
    from tensorflow_ocr_ray.pipelines.similarity import ann_topk_brute

    df = ann_topk_brute(SF, k=10)
    assert len(df) == 10
    assert df["sim"].tolist() == sorted(df["sim"].tolist(), reverse=True)
