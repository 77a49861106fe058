"""connected_components (distributed min-label propagation) vs a
sequential union-find reference on adversarial graph shapes."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd


def _uf_labels(edges: pd.DataFrame) -> pd.DataFrame:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(edges["doc_a"], edges["doc_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return (
        pd.DataFrame(
            {"node": sorted(parent), "label": [find(n) for n in sorted(parent)]}
        ).astype("int64")
    )


def _run_cc(edges: pd.DataFrame, **kw) -> pd.DataFrame:
    from tensorflow_ocr_ray.stages.cc import connected_components

    got = (
        connected_components(rd.from_pandas(edges), **kw)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    return got


def test_cc_random_graph_matches_union_find(ray_session):
    rng = np.random.default_rng(5)
    edges = pd.DataFrame(
        {"doc_a": rng.integers(0, 400, 600),
         "doc_b": rng.integers(0, 400, 600)}
    ).astype("int64")
    edges = edges[edges["doc_a"] != edges["doc_b"]]
    got = _run_cc(edges)
    want = _uf_labels(edges)
    pd.testing.assert_frame_equal(got, want)


def test_cc_chain_needs_propagation_rounds(ray_session):
    # a 40-node path: worst diameter for label propagation
    n = 40
    edges = pd.DataFrame(
        {"doc_a": np.arange(n - 1), "doc_b": np.arange(1, n)}
    ).astype("int64")
    got = _run_cc(edges, n_shards=8)
    assert (got["label"] == 0).all()
    assert got["node"].tolist() == list(range(n))


def test_cc_disjoint_cliques_and_sparse_ids(ray_session):
    # two cliques with huge sparse ids + one isolated pair
    cl1 = [10_000_019, 99, 5_000_000]
    cl2 = [7, 123_456_789]
    edges = pd.DataFrame(
        [(a, b) for i, a in enumerate(cl1) for b in cl1[i + 1:]]
        + [(cl2[0], cl2[1])],
        columns=["doc_a", "doc_b"],
    ).astype("int64")
    got = _run_cc(edges, n_shards=4)
    lab = dict(zip(got["node"], got["label"]))
    assert lab[10_000_019] == lab[5_000_000] == lab[99] == 99
    assert lab[123_456_789] == 7


def test_cc_empty_edges(ray_session):
    from tensorflow_ocr_ray.stages.cc import connected_components

    edges = pd.DataFrame(
        {"doc_a": pd.Series([], dtype="int64"),
         "doc_b": pd.Series([], dtype="int64")}
    )
    ds = connected_components(rd.from_pandas(edges))
    assert ds.count() == 0
    # (Ray's to_pandas drops columns on 0-block datasets; the schema is
    # the contract surface here)
    assert sorted(ds.schema().names) == ["label", "node"]


def test_cc_duplicate_and_reversed_edges(ray_session):
    edges = pd.DataFrame(
        {"doc_a": [3, 5, 5, 8, 8, 3], "doc_b": [5, 3, 3, 9, 9, 5]}
    ).astype("int64")
    got = _run_cc(edges, n_shards=3)
    lab = dict(zip(got["node"], got["label"]))
    assert lab == {3: 3, 5: 3, 8: 8, 9: 8}
