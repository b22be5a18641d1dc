"""Distributed graph operators over pair/edge Datasets.

The dedup family (``dataprep.minhash_lsh_pairs`` / ``ngram_jaccard_pairs``
/ ``simhash_pairs``) emits PAIRS; a training-data pipeline then needs the
transitive closure of those pairs — duplicate CLUSTERS — so it can keep
one canonical document per cluster.  That is connected components over
the near-dup graph, an operator Ray Data has no primitive for.

Implementation: iterative min-label propagation expressed entirely as
Dataset transforms (the "hash-to-min" family of MapReduce CC algorithms
— Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14 — simplified to plain neighbor-min propagation, which converges
in O(diameter) rounds; near-dup clusters are shallow, so diameter is
small by construction).  Each round is two coarse-bucket shuffles over
EDGE-sized data (never corpus-sized):

  pass 1  bucket-by(u):  co-locate each node's current label with the
          edges leaving it; emit (v, label[u]) candidates + the node's
          own (u, label[u]) — all vectorized searchsorted, no per-node
          Python;
  pass 2  bucket-by(node): new label = min(candidates) per node.

Labels are MATERIALIZED every round (the table is |V|-sized — bounded by
the number of documents that appear in any near-dup pair, far smaller
than the corpus) so iteration N+1 does not re-execute round N's lineage.
Convergence is detected from the label-sum aggregate: labels only ever
decrease, so an unchanged sum over a fixed node set is a fixpoint — one
tiny aggregate per round instead of a change-count join.

At 100 TB scale the partitioning assumption is only that one BUCKET of
edge endpoints fits a task (~|E|/num_buckets rows); skewed hub nodes
cost nothing here because the per-bucket kernel is a sort, not a
per-node loop.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Count, Sum

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _bucket_of(ids: np.ndarray, num_buckets: int) -> np.ndarray:
    return ((ids.astype(np.uint64) * _MIX) % np.uint64(num_buckets)).astype(np.int32)


def connected_components(
    edges: ray.data.Dataset,
    *,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    out_node: str = "doc_id",
    out_label: str = "cluster_id",
    num_buckets: int | None = None,
    rows_per_bucket: int = 65_536,
    max_iters: int = 64,
) -> ray.data.Dataset:
    """Connected components of the undirected graph given by
    (``src_col``, ``dst_col``) pairs.  Returns one row per node that
    appears in any edge: (``out_node``, ``out_label``) where the label
    is the smallest node id in the component.  Isolated documents (no
    edges) are intentionally absent — they are their own cluster and
    emitting corpus-sized output from an edge-sized input would defeat
    the point.

    ``num_buckets`` defaults to ADAPTIVE: ~``rows_per_bucket`` directed
    edges per bucket, capped at 64 — a near-dup graph is usually orders
    of magnitude smaller than its corpus, and a fixed-wide shuffle would
    make every propagation round pay 64 tasks of pure scheduling for a
    few hundred edges.  Pass an explicit width for known-huge graphs.
    """

    def to_directed(batch: pa.Table) -> pa.Table:
        a = batch[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "key": pa.array(np.concatenate([a, b])),
                "other": pa.array(np.concatenate([b, a])),
            }
        )

    # Edges are read many times (once per round) — materialize ONCE so the
    # upstream pair-generation lineage (LSH banding etc.) never re-runs.
    raw = edges.map_batches(
        to_directed, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    n_directed = raw.count()  # free: materialized metadata
    if n_directed == 0:
        empty = pa.table(
            {
                out_node: pa.array([], type=pa.int64()),
                out_label: pa.array([], type=pa.int64()),
            }
        )
        return ray.data.from_arrow(empty)

    if num_buckets is None:
        num_buckets = min(64, (n_directed - 1) // rows_per_bucket + 1)

    def add_edge_cols(batch: pa.Table) -> pa.Table:
        u = batch["key"].to_numpy()
        return pa.table(
            {
                "key": batch["key"],
                "other": batch["other"],
                "label": pa.array(np.zeros(len(u), dtype=np.int64)),
                "kind": pa.array(np.zeros(len(u), dtype=np.int8)),
                "bucket": pa.array(_bucket_of(u, num_buckets)),
            }
        )

    # coalesce to the shuffle width so every round's union/groupby moves
    # num_buckets blocks, not one block per upstream pair-gen task
    directed = (
        raw.repartition(num_buckets)
        .map_batches(add_edge_cols, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )

    def init_labels(batch: pa.Table) -> pa.Table:
        u = np.unique(batch["key"].to_numpy())  # local dedup before the shuffle
        return pa.table(
            {
                "node": pa.array(u),
                "cand": pa.array(u),
                "bucket": pa.array(_bucket_of(u, num_buckets)),
            }
        )

    def min_per_node(group: pa.Table) -> pa.Table:
        n = group["node"].to_numpy()
        c = group["cand"].to_numpy()
        order = np.lexsort((c, n))
        n, c = n[order], c[order]
        first = np.r_[True, n[1:] != n[:-1]]
        return pa.table({"node": pa.array(n[first]), "label": pa.array(c[first])})

    labels = (
        directed.select_columns(["key"])
        .map_batches(init_labels, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(min_per_node, batch_format="pyarrow")
        .materialize()
    )

    def tag_labels(batch: pa.Table) -> pa.Table:
        node = batch["node"].to_numpy()
        return pa.table(
            {
                "key": batch["node"],
                "other": pa.array(np.zeros(len(node), dtype=np.int64)),
                "label": batch["label"],
                "kind": pa.array(np.ones(len(node), dtype=np.int8)),
                "bucket": pa.array(_bucket_of(node, num_buckets)),
            }
        )

    def gather_candidates(group: pa.Table) -> pa.Table:
        kind = group["kind"].to_numpy()
        key = group["key"].to_numpy()
        is_lab = kind == 1
        ln = key[is_lab]
        lv = group["label"].to_numpy()[is_lab]
        order = np.argsort(ln, kind="stable")
        ln, lv = ln[order], lv[order]
        ek = key[~is_lab]
        eo = group["other"].to_numpy()[~is_lab]
        # every edge endpoint has a label row in its own bucket by
        # construction, so searchsorted is an exact lookup
        neigh = lv[np.searchsorted(ln, ek)]
        node = np.concatenate([eo, ln])
        cand = np.concatenate([neigh, lv])
        return pa.table(
            {
                "node": pa.array(node),
                "cand": pa.array(cand),
                "bucket": pa.array(_bucket_of(node, num_buckets)),
            }
        )

    prev_sum: int | None = None
    for _ in range(max_iters):
        labels = (
            directed.union(labels.map_batches(tag_labels, batch_format="pyarrow"))
            .groupby("bucket")
            .map_groups(gather_candidates, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(min_per_node, batch_format="pyarrow")
            .materialize()
        )
        agg = labels.aggregate(Sum("label"), Count())
        cur = (int(agg["sum(label)"]), int(agg["count()"]))
        # labels only decrease over a fixed node set: equal sum => fixpoint
        if prev_sum == cur:
            break
        prev_sum = cur

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({out_node: batch["node"], out_label: batch["label"]})

    return labels.map_batches(finish, batch_format="pyarrow").sort(out_node)
