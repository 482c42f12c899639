"""Distributed connected components on Ray Data (hash-min label
propagation — the MapReduce CC of Kiveris et al. 2014 in its simplest
star-friendly form) and near-duplicate clustering built on it.

Scale shape: nodes/edges live in Datasets end-to-end (never a driver-side
graph). One iteration = one bucketed co-shuffle of labels with the
symmetrized edges (labels ride to their node's bucket, each edge endpoint
rides to its sender's bucket) emitting min-label messages, then a bucketed
min-reduce per node. Labels only decrease, so sum(label) is a strict
monotone — equality between rounds IS convergence, checked with one cheap
aggregate. The per-round ``materialize()`` is on the LABEL table only
(O(#nodes-in-dup-pairs), orders of magnitude smaller than the corpus) —
without it each round's lineage would re-execute all prior rounds.

Edge sets produced by LSH verify are stars toward a local min id, so
convergence is typically 2-3 rounds even on chained near-dup clusters.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd
from ..config import driver_limit as _cfg_driver_limit

if TYPE_CHECKING:  # pragma: no cover
    import ray.data


def _driver_union_find(src: np.ndarray, dst: np.ndarray) -> pd.DataFrame:
    """In-memory DSU with path compression; roots always point to the
    component's min node id, so the final root IS the cluster id."""
    nodes, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
    parent = np.arange(len(nodes), dtype=np.int64)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    a, b = inv[:len(src)], inv[len(src):]
    for i, j in zip(a.tolist(), b.tolist()):
        ri, rj = find(i), find(j)
        if ri != rj:
            if ri < rj:
                parent[rj] = ri
            else:
                parent[ri] = rj
    roots = np.array([find(i) for i in range(len(nodes))], np.int64)
    return pd.DataFrame({"node": nodes, "cluster_id": nodes[roots]})


def connected_components(edges: "ray.data.Dataset", *,
                         src_col: str = "src", dst_col: str = "dst",
                         max_iters: int = 10,
                         num_buckets: int | None = None,
                         strategy: str = "auto",
                         driver_limit: int | None = None) -> "ray.data.Dataset":
    """Labels every node reachable through ``edges`` with the minimum node
    id of its component. Returns a Dataset (node, cluster_id). Node ids
    must be a totally ordered numeric/string type (min is the canonical
    representative, matching the dedup survivor convention).

    ``strategy``: ``"driver"`` collects the edge list and runs an in-memory
    union-find; ``"distributed"`` runs bucketed hash-min label propagation;
    ``"auto"`` (default) picks driver below ``driver_limit`` edges — the
    same materialize-once + size-guard pattern as the join stages'
    broadcast_limit. The edge table is the small side by construction
    (O(duplicate docs), not O(corpus)); per-round scheduling overhead
    dominates tiny graphs, while the distributed path is the only one that
    survives billions of edges."""
    import pyarrow as pa

    from ..core.hashing import add_bucket_column, quiet_ray_data_logs

    nb = num_buckets or 64

    def sym(t: pa.Table) -> pa.Table:
        quiet_ray_data_logs()
        fwd = pa.table({"node": t[src_col], "peer": t[dst_col]})
        rev = pa.table({"node": t[dst_col], "peer": t[src_col]})
        return pa.concat_tables([fwd, rev]).replace_schema_metadata(None)

    # materialize ONCE: each propagation round re-reads the edge table, and
    # without this the full upstream lineage (LSH shuffle etc.) would
    # re-execute per round
    sym_edges = edges.map_batches(sym, batch_format="pyarrow",
                                  batch_size=None).materialize()

    n_edges = sym_edges.count() // 2  # metadata read on a materialized ds
    if strategy == "driver" or (
            strategy == "auto"
            and n_edges <= _cfg_driver_limit(driver_limit, 2_000_000)):
        import ray.data as rd

        df = sym_edges.to_pandas()
        # feed BOTH directions to the DSU: blocks interleave fwd/rev rows
        # (sym emits per block), so any prefix-halving would drop real
        # edges on multi-block inputs; reverse duplicates are harmless
        out = _driver_union_find(df["node"].to_numpy(),
                                 df["peer"].to_numpy())
        return rd.from_arrow(pa.Table.from_pandas(out, preserve_index=False)
                             .replace_schema_metadata(None))

    def init_labels(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["node"], "label": t["node"]})

    def dedup_nodes(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates("node")[["node", "label"]]

    add_n = add_bucket_column(["node"], "__nb", nb)
    labels = (sym_edges.map_batches(init_labels, batch_format="pyarrow",
                                    batch_size=None)
              .map_batches(add_n, batch_format="pyarrow", batch_size=None)
              .groupby("__nb").map_groups(dedup_nodes, batch_format="pandas")
              .materialize())

    from ..core.empty_ds import union_any

    def propagate(g: pd.DataFrame) -> pd.DataFrame:
        # rows of one node bucket: label rows (__lab) + edge rows. A null
        # sentinel would work too, but Arrow nulls turn int columns float
        # in pandas — the ids must keep their exact dtype or they hash to
        # different buckets next round.
        quiet_ray_data_logs()
        is_lab = g["__lab"].to_numpy(bool)
        labs = g[is_lab]
        ed = g[~is_lab]
        # message to each peer: sender's current label
        lab_of = labs.set_index("node")["label"]
        msgs = pd.DataFrame({
            "node": ed["peer"].to_numpy(),
            "label": lab_of.reindex(ed["node"]).to_numpy(),
        })
        return pd.concat([labs[["node", "label"]], msgs], ignore_index=True)

    def reduce_min(g: pd.DataFrame) -> pd.DataFrame:
        quiet_ray_data_logs()
        return g.groupby("node", as_index=False)["label"].min()

    def to_lab_rows(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["node"], "label": t["label"],
                         "peer": t["node"],
                         "__lab": pa.array(np.ones(t.num_rows, bool))})

    def to_edge_rows(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["node"], "label": t["node"],
                         "peer": t["peer"],
                         "__lab": pa.array(np.zeros(t.num_rows, bool))})

    prev_sum = None
    for _ in range(max_iters):
        lab_rows = labels.map_batches(to_lab_rows, batch_format="pyarrow",
                                      batch_size=None)
        edge_rows = sym_edges.map_batches(to_edge_rows, batch_format="pyarrow",
                                          batch_size=None)
        labels = (union_any(lab_rows, edge_rows)
                  .map_batches(add_n, batch_format="pyarrow", batch_size=None)
                  .groupby("__nb").map_groups(propagate, batch_format="pandas")
                  .map_batches(add_n, batch_format="pyarrow", batch_size=None)
                  .groupby("__nb").map_groups(reduce_min, batch_format="pandas")
                  .materialize())
        # labels only decrease, so an UNCHANGED exact checksum means
        # converged. The sum is exact integer arithmetic (per-block
        # 32-bit-split int64 partials folded as Python ints) — a float64
        # sum's ulp grows with the total and would declare convergence
        # early once per-round decreases drop below its resolution.
        parts = labels.map_batches(_label_checksum, batch_format="pandas",
                                   batch_size=None).to_pandas()
        s = (int(parts["lo"].sum()) + (int(parts["hi"].sum()) << 32),
             int(parts["n"].sum()))
        if s == prev_sum:
            break
        prev_sum = s
    return labels.map_batches(
        lambda df: df.rename(columns={"label": "cluster_id"}),
        batch_format="pandas", batch_size=None)


def _label_checksum(df: pd.DataFrame) -> pd.DataFrame:
    """Exact per-block label-sum partial: the uint64 label (numeric ids
    directly, string ids via stable hash) split into 32-bit halves, each
    summed in int64 (exact for blocks < 2^31 rows); the driver recombines
    with Python ints so the global sum never rounds."""
    lab = df["label"]
    if lab.dtype.kind in "iu":
        v = lab.to_numpy().astype(np.uint64)
    elif lab.dtype.kind == "f":
        v = lab.to_numpy(np.float64).astype(np.uint64)
    else:
        from ..core.hashing import stable_hash64

        v = stable_hash64(lab).astype(np.uint64)
    lo = (v & np.uint64(0xFFFFFFFF)).astype(np.int64)
    hi = (v >> np.uint64(32)).astype(np.int64)
    return pd.DataFrame({"lo": [int(lo.sum())], "hi": [int(hi.sum())],
                         "n": [len(v)]})


def dup_clusters(ds: "ray.data.Dataset", text_col: str, id_col: str, *,
                 num_perm: int = 64, bands: int = 16, shingle_k: int = 5,
                 jaccard_threshold: float = 0.8, seed: int = 42,
                 max_iters: int = 10) -> "ray.data.Dataset":
    """Near-duplicate clustering: MinHash-LSH verified pairs → connected
    components → (doc id, cluster_id=min doc id of the cluster). Docs with
    no near-dup partner are omitted (their cluster is trivially
    themselves), keeping the output proportional to the duplicate set."""
    from .dedup import minhash_candidate_pairs

    pairs = minhash_candidate_pairs(
        ds, text_col, id_col, num_perm=num_perm, bands=bands,
        shingle_k=shingle_k, jaccard_threshold=jaccard_threshold, seed=seed)
    return connected_components(pairs, src_col="src", dst_col="dst",
                                max_iters=max_iters) \
        .map_batches(lambda df: df.rename(columns={"node": id_col}),
                     batch_format="pandas", batch_size=None)
