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
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
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


def pagerank_int(
    edges: ray.data.Dataset,
    *,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    iters: int = 3,
    scale: int = 1_000_000_000_000,
    num_buckets: int | None = None,
    rows_per_bucket: int = 65_536,
    out_node: str = "doc_id",
    out_rank: str = "rank_scaled",
) -> ray.data.Dataset:
    """PageRank over the undirected pair graph in FIXED-POINT integer
    arithmetic — the iterative-ranking operator (importance within a
    near-dup cluster, link authority on a crawl graph) done so the
    result is bit-identical on any engine and therefore SQL-checkable
    by unrolling the iterations into CTEs: every quantity is an int64,
    every division a floor division, every aggregate an integer sum —
    no float accumulation order anywhere.

    Semantics (pinned): symmetrize pairs; N = |nodes|; deg = degree in
    the symmetrized graph; r0 = scale // N; then ``iters`` rounds of
      r'(v) = (3*scale) // (20*N)  +  sum over edges u->v of
              (17 * r(u)) // (20 * deg(u))
    i.e. damping 0.85 written as the exact rational 17/20.  Every node
    of an undirected graph has in-edges, so the per-destination sum
    covers all nodes.

    Shape: same bucket discipline as ``connected_components`` — edges
    are materialized once with deg(u) FOLDED INTO the edge row (static
    across rounds, so the per-round union carries only the |V|-sized
    rank table), each round is two coarse-bucket exchanges over
    edge-sized data, ranks are materialized per round so round t+1
    never re-executes round t's lineage."""

    def to_directed(batch: pa.Table) -> pa.Table:
        a = batch[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "key": pa.array(np.concatenate([a, b])),
                "other": pa.array(np.concatenate([b, a])),
            }
        )

    raw = edges.map_batches(
        to_directed, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    n_directed = raw.count()
    if n_directed == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    out_node: pa.array([], type=pa.int64()),
                    out_rank: pa.array([], type=pa.int64()),
                }
            )
        )
    if num_buckets is None:
        num_buckets = min(64, (n_directed - 1) // rows_per_bucket + 1)

    def add_bucket(batch: pa.Table) -> pa.Table:
        u = batch["key"].to_numpy()
        return batch.append_column("bucket", pa.array(_bucket_of(u, num_buckets)))

    bucketed = (
        raw.repartition(num_buckets)
        .map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )

    # per-bucket: attach deg(u) to every edge (all of u's edges share its
    # bucket); one run-detection pass, no per-node Python
    def attach_deg(group: pa.Table) -> pa.Table:
        key = group["key"].to_numpy()
        other = group["other"].to_numpy()
        order = np.argsort(key, kind="stable")
        key, other = key[order], other[order]
        first = np.r_[True, key[1:] != key[:-1]]
        starts = np.flatnonzero(first)
        runs = np.diff(np.r_[starts, len(key)])
        deg = np.repeat(runs, runs).astype(np.int64)
        return pa.table(
            {
                "key": pa.array(key),
                "other": pa.array(other),
                "val": pa.array(deg),
                "kind": pa.array(np.zeros(len(key), dtype=np.int8)),
                "bucket": pa.array(_bucket_of(key, num_buckets)),
            }
        )

    edges_deg = (
        bucketed.groupby("bucket")
        .map_groups(attach_deg, batch_format="pyarrow")
        .materialize()
    )

    def init_nodes(group: pa.Table) -> pa.Table:
        u = np.unique(group["key"].to_numpy())
        return pa.table({"node": pa.array(u)})

    nodes = (
        bucketed.groupby("bucket")
        .map_groups(init_nodes, batch_format="pyarrow")
        .materialize()
    )
    n_nodes = nodes.count()
    r0 = scale // n_nodes
    base = (3 * scale) // (20 * n_nodes)

    def init_ranks(batch: pa.Table) -> pa.Table:
        node = batch["node"].to_numpy()
        return pa.table(
            {
                "node": pa.array(node),
                "r": pa.array(np.full(len(node), r0, dtype=np.int64)),
                "bucket": pa.array(_bucket_of(node, num_buckets)),
            }
        )

    ranks = nodes.map_batches(
        init_ranks, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def tag_ranks(batch: pa.Table) -> pa.Table:
        node = batch["node"].to_numpy()
        return pa.table(
            {
                "key": batch["node"],
                "other": pa.array(np.zeros(len(node), dtype=np.int64)),
                "val": batch["r"],
                "kind": pa.array(np.ones(len(node), dtype=np.int8)),
                "bucket": batch["bucket"],
            }
        )

    def contribs(group: pa.Table) -> pa.Table:
        kind = group["kind"].to_numpy()
        key = group["key"].to_numpy()
        val = group["val"].to_numpy()
        is_rank = kind == 1
        rn, rv = key[is_rank], val[is_rank]
        order = np.argsort(rn, kind="stable")
        rn, rv = rn[order], rv[order]
        ek = key[~is_rank]
        eo = group["other"].to_numpy()[~is_rank]
        ed = val[~is_rank]
        r_u = rv[np.searchsorted(rn, ek)]  # exact lookup by construction
        c = (17 * r_u) // (20 * ed)
        return pa.table(
            {
                "node": pa.array(eo),
                "c": pa.array(c),
                "bucket": pa.array(_bucket_of(eo, num_buckets)),
            }
        )

    def sum_per_node(group: pa.Table) -> pa.Table:
        node = group["node"].to_numpy()
        c = group["c"].to_numpy()
        order = np.argsort(node, kind="stable")
        node, c = node[order], c[order]
        first = np.r_[True, node[1:] != node[:-1]]
        starts = np.flatnonzero(first)
        sums = np.add.reduceat(c, starts)
        u = node[starts]
        return pa.table(
            {
                "node": pa.array(u),
                "r": pa.array(base + sums),
                "bucket": pa.array(_bucket_of(u, num_buckets)),
            }
        )

    for _ in range(iters):
        ranks = (
            edges_deg.union(ranks.map_batches(tag_ranks, batch_format="pyarrow"))
            .groupby("bucket")
            .map_groups(contribs, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(sum_per_node, batch_format="pyarrow")
            .materialize()
        )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({out_node: batch["node"], out_rank: batch["r"]})

    return ranks.map_batches(finish, batch_format="pyarrow").sort(out_node)


def triangles(
    pairs: ray.data.Dataset,
    *,
    num_buckets: int = 64,
    max_degree: int = 10_000,
) -> ray.data.Dataset:
    """Triangle enumeration over an oriented edge Dataset (doc_a <
    doc_b) — the classic MapReduce wedge-check algorithm (Suri & Vassilvitskii,
    "Counting Triangles and the Curse of the Last Reducer", WWW'11):

      pass 1  bucket-by(lowest vertex a): each node's out-neighborhood
              {b: (a,b) in E} is co-located; emit every wedge (b, c, a)
              with b < c — vectorized triu over runs of a, reusing the
              dedup family's ``_pairs_within_runs`` kernel;
      pass 2  bucket-by(packed (b, c) key): union the wedges with the
              edge list itself tagged is_edge; a wedge closes a triangle
              iff its (b, c) key also appears as an edge — a vectorized
              isin per bucket, never a per-wedge probe.

    Returns the closed triangles as rows (a, b, c), a < b < c, sorted.

    Scale notes: wedge count is sum(deg_out choose 2) — the skew hazard
    is a hub with huge out-degree; ``max_degree`` bounds the triu
    (nodes above it are skipped loudly via a 'skipped_hubs' side count
    in the docstring contract — the degree-ordered orientation that
    makes this bound tight is the standard fix and is what doc-id order
    approximates for near-dup graphs, whose clusters are small and
    dense).  Both passes move edge/wedge-sized data only, never the
    corpus."""
    from .dataprep import _pack_pairs, _pairs_within_runs

    # both passes consume `pairs`; without pinning, the whole upstream
    # lineage (e.g. a near-dup pair pipeline) would execute TWICE inside
    # the union plan — the edge list is edge-sized, so pin it once
    pairs = pairs.materialize()

    def wedges(df):
        df = df.sort_values(["doc_a", "doc_b"], kind="mergesort")
        a = df["doc_a"].to_numpy(np.int64)
        b = df["doc_b"].to_numpy(np.int64)
        n = len(a)
        starts = np.flatnonzero(np.r_[True, a[1:] != a[:-1]]) if n else np.zeros(0, np.int64)
        lens = np.diff(np.r_[starts, n])
        gi, gj = _pairs_within_runs(starts, lens, max_degree)
        return pd.DataFrame(
            {
                "u": b[gi],  # b < c because b is sorted within the run
                "v": b[gj],
                "apex": a[gi],
                "is_edge": np.zeros(len(gi), dtype=np.int8),
            }
        )

    def add_bucket_a(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "bucket", pa.array(_bucket_of(batch["doc_a"].to_numpy(), num_buckets))
        )

    def add_bucket_uv(batch: pa.Table) -> pa.Table:
        key = _pack_pairs(batch["u"].to_numpy(), batch["v"].to_numpy())
        return batch.append_column(
            "bucket", pa.array(((key * _MIX) % np.uint64(num_buckets)).astype(np.int32))
        )

    def close_wedges(df):
        key = _pack_pairs(df["u"].to_numpy(np.int64), df["v"].to_numpy(np.int64))
        is_edge = df["is_edge"].to_numpy(np.int8) == 1
        w = ~is_edge
        closed = np.isin(key[w], key[is_edge])
        return pd.DataFrame(
            {
                "a": df["apex"].to_numpy(np.int64)[w][closed],
                "b": df["u"].to_numpy(np.int64)[w][closed],
                "c": df["v"].to_numpy(np.int64)[w][closed],
            }
        )

    wedge_ds = (
        pairs.map_batches(
            add_bucket_a,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=262_144,
        )
        .groupby("bucket")
        .map_groups(wedges, batch_format="pandas")
    )

    def edge_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "u": pc.cast(batch["doc_a"], pa.int64()),
                "v": pc.cast(batch["doc_b"], pa.int64()),
                "apex": pa.array(np.full(n, -1, dtype=np.int64)),
                "is_edge": pa.array(np.ones(n, dtype=np.int8)),
            }
        )

    edge_ds = pairs.map_batches(
        edge_rows, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=262_144,
    )

    return (
        wedge_ds.union(edge_ds)
        # no batch_size here: the union mixes arrow (edge) and pandas
        # (wedge map_groups) blocks, and Ray's batcher cannot re-bundle
        # across block types (delegating_block_builder assert)
        .map_batches(add_bucket_uv, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(close_wedges, batch_format="pandas")
        .sort(["a", "b", "c"])
    )
