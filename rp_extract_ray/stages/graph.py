"""Distributed graph operators over edge-list Datasets.

The training-data pipeline's graph shapes: a co-visitation edge builder
(entities sharing a context key), PageRank by power iteration, and triangle
counting — all expressed as keyed exchanges over the repo's task-shuffle
primitives (``partitioned_apply`` / ``grouped_reduce`` /
``repartition_join``), never an adjacency matrix.

Reference analogue: none (the audio reference has no graph ops); these are
the similarity-graph companions of stages/dedup.py's connected components,
which already power near-dup clustering. SURVEY.md §2 extension class.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset

_PR_MERGE_FAN = 64


@ray.remote
def _pr_prep(nodes: np.ndarray, *tbls: pa.Table):
    """Pre-convert symmetric edge blocks to one (src_idx, dst_idx[, w])
    triple. Zero-row blocks arrive schema-less and would poison the
    concat."""
    tbls = [t for t in tbls if t.num_rows]
    if not tbls:
        z = np.empty(0, dtype=np.int64)
        return (z, z, None)
    t = pa.concat_tables(tbls)
    s = t.column("src").to_numpy(zero_copy_only=False)
    d = t.column("dst").to_numpy(zero_copy_only=False)
    w = (
        t.column("_w").to_numpy(zero_copy_only=False).astype(np.float64)
        if "_w" in t.column_names
        else None
    )
    return (
        np.searchsorted(nodes, s).astype(np.int64),
        np.searchsorted(nodes, d).astype(np.int64),
        w,
    )


@ray.remote
def _pr_contrib(blk, share: np.ndarray) -> np.ndarray:
    si, di, w = blk
    c = share[si] if w is None else share[si] * w
    return np.bincount(di, weights=c, minlength=len(share))


@ray.remote
def _pr_vec_merge(*vecs: np.ndarray) -> np.ndarray:
    return np.sum(vecs, axis=0)


def _symmetrize(
    edges: Dataset,
    u_col: str = "u",
    v_col: str = "v",
    weight_col: str | None = None,
) -> Dataset:
    """Undirected edge list -> both directed arcs (src, dst[, _w])."""

    def sym(b: pa.Table) -> pa.Table:
        uu = b.column(u_col).to_numpy(zero_copy_only=False)
        vv = b.column(v_col).to_numpy(zero_copy_only=False)
        cols = {
            "src": np.concatenate([uu, vv]),
            "dst": np.concatenate([vv, uu]),
        }
        if weight_col is not None:
            w = b.column(weight_col).to_numpy(zero_copy_only=False).astype(
                np.float64
            )
            cols["_w"] = np.concatenate([w, w])
        return pa.table(cols)

    return edges.map_batches(sym, batch_format="pyarrow")


def covisit_edges(
    ds: Dataset,
    group_cols,
    item_col: str,
    *,
    out_names: "tuple[str, str]" = ("u", "v"),
    num_partitions: int | None = None,
    keep_count: bool = False,
) -> Dataset:
    """Distinct undirected co-visitation edges: one edge (u < v) per pair
    of items that ever share a group (e.g. users active in the same
    (event_type, time-bucket) cell). A thin orientation of
    :func:`rp_extract_ray.stages.groupops.cooccurrence_pairs` — the pair
    COUNT is dropped unless ``keep_count`` (then it rides along as ``n``,
    the natural edge weight).

    Skew note: the in-partition pair fan-out is bounded by
    ``sum(items_per_group^2)`` — pick the group granularity (bucket width)
    so hot groups stay small, exactly like the LSH band-bucket rule in
    stages/dedup.py.
    """
    from rp_extract_ray.stages.groupops import cooccurrence_pairs

    gcols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    if len(gcols) == 1:
        keyed, key = ds, gcols[0]
    else:
        # fold the composite group to one int64 surrogate (collision-safe
        # for grouping: a collision only merges two contexts, which can
        # only ADD edges — avoided by the repo's stable 64-bit mix)
        from rp_extract_ray.stages.partition import stable_hash

        def mix(b: pa.Table) -> pa.Table:
            h = None
            for c in gcols:
                hc = stable_hash(b.column(c).to_numpy(zero_copy_only=False))
                h = hc if h is None else (h * np.uint64(0x9E3779B97F4A7C15)) ^ hc
            return pa.table(
                {"_gk": h.view(np.int64), item_col: b.column(item_col)}
            )

        keyed, key = ds.map_batches(mix, batch_format="pyarrow"), "_gk"

    pairs = cooccurrence_pairs(
        keyed, key, item_col, out_names=out_names,
        num_partitions=num_partitions,
    )
    cols = list(out_names) + (["n"] if keep_count else [])
    return pairs.select_columns(cols)


def pagerank(
    edges: Dataset,
    *,
    u_col: str = "u",
    v_col: str = "v",
    iterations: int = 5,
    damping: float = 0.85,
    round_to: int | None = None,
    num_partitions: int | None = None,
    broadcast_nodes_limit: int = 2_000_000,
    weight_col: str | None = None,
) -> pd.DataFrame | Dataset:
    """PageRank over an UNDIRECTED distinct edge list (each edge walks both
    ways), fixed ``iterations`` of the power method:

        r' = (1 - d) / N  +  d * sum_{(s -> t)} w_st * r_s / W_s

    With ``weight_col`` the walk is weight-proportional (``W_s`` = the
    node's total incident weight); without it every weight is 1 and the
    update reduces to the classic ``r_s / deg_s``.

    Dangling nodes cannot arise (symmetrization gives every node an
    out-edge), so the update is exactly the SQL-expressible join-aggregate
    form — the oracle unrolls the same iterations.

    Scale paths (the repo's size-hint collapse convention):
    * node table under ``broadcast_nodes_limit``: ranks live in a
      ``ray.put`` (node -> rank) vector; each iteration is one
      ``map_batches`` pass over the (never re-shuffled) symmetric edges
      producing per-block partial dst-sums + one ``grouped_reduce``
      exchange bounded by distinct nodes per block, with the new bounded
      rank vector pulled back to the driver (same contract as kmeans'
      centroid loop).
    * above the limit: ranks stay a Dataset; each iteration is
      ``repartition_join`` (edges x ranks on src) -> ``grouped_reduce``
      dst-sum -> left join back onto the degree table — three keyed
      exchanges per iteration, nothing driver-side. Both paths are
      value-identical (pytest-gated).

    Returns the bounded path's pandas frame or the distributed Dataset:
    ``(node, rank)``.
    """
    from rp_extract_ray.stages.groupops import grouped_reduce

    # ONE full execution of the edge lineage; every later pass (degree,
    # iterations, both scale paths) reads the pinned symmetric blocks
    sedges = _symmetrize(edges, u_col, v_col, weight_col).materialize()
    # "deg" is the walk normalizer: out-degree unweighted, total incident
    # weight W_s when weighted. Materialized: count(), the bounded-path
    # to_pandas(), and the large path's per-iteration joins all reuse it.
    deg = grouped_reduce(
        sedges, "src",
        {"deg": ("dst", "count") if weight_col is None else ("_w", "sum")},
        num_partitions=num_partitions,
    ).materialize()
    n_nodes = deg.count()
    if n_nodes == 0:
        return pd.DataFrame({"node": [], "rank": []})
    base = (1.0 - damping) / n_nodes

    if n_nodes <= broadcast_nodes_limit:
        # ---- bounded-node path (the kmeans centroid-loop contract):
        # edge blocks pre-convert ONCE to pinned (src_idx, dst_idx) index
        # pairs; each iteration is plain Ray tasks folding per-block
        # dense contribution vectors (np.bincount) through a fan-in tree
        # merge — no Dataset machinery, no per-iteration exchange. The
        # dense N-vector is rank-vector-sized, which the node budget
        # already bounds.
        deg_pdf = deg.to_pandas().sort_values("src", ignore_index=True)
        nodes = deg_pdf["src"].to_numpy()
        degv = deg_pdf["deg"].to_numpy(dtype=np.float64)
        rank = np.full(n_nodes, 1.0 / n_nodes)
        nodes_ref = ray.put(nodes)
        refs = sedges.to_arrow_refs()
        blocks = [_pr_prep.remote(nodes_ref, *refs[i: i + 8])
                  for i in range(0, len(refs), 8)]
        for _ in range(iterations):
            share_ref = ray.put(rank / degv)
            parts = [_pr_contrib.remote(b, share_ref) for b in blocks]
            while len(parts) > _PR_MERGE_FAN:
                parts = [
                    _pr_vec_merge.remote(*parts[i: i + _PR_MERGE_FAN])
                    for i in range(0, len(parts), _PR_MERGE_FAN)
                ]
            s = ray.get(_pr_vec_merge.remote(*parts))
            # every node has in-edges (symmetric graph) -> full vector
            rank = base + damping * s
        if round_to is not None:
            from rp_extract_ray.functions.rounding import round_half_away

            rank = round_half_away(rank, round_to)
        return pd.DataFrame({"node": nodes, "rank": rank})

    # ---- large-node path: ranks stay distributed
    from rp_extract_ray.stages.join import repartition_join

    state = deg.map_batches(
        lambda b: b.append_column(
            "rank", pa.array(np.full(len(b), 1.0 / n_nodes))
        ),
        batch_format="pyarrow",
    )
    for _ in range(iterations):
        joined = repartition_join(
            sedges, state, on="src", num_partitions=num_partitions,
        )

        def weigh(b: pa.Table) -> pa.Table:
            w = (
                b.column("rank").to_numpy(zero_copy_only=False)
                / b.column("deg").to_numpy(zero_copy_only=False)
            )
            if "_w" in b.column_names:
                w = w * b.column("_w").to_numpy(zero_copy_only=False)
            return pa.table({"node": b.column("dst"), "_s": pa.array(w)})

        sums = grouped_reduce(
            joined.map_batches(weigh, batch_format="pyarrow"),
            "node", {"_s": ("_s", "sum")},
            num_partitions=num_partitions,
        )
        state = repartition_join(
            deg, sums, on="src", right_on="node",
            num_partitions=num_partitions,
        ).map_batches(
            lambda b: pa.table(
                {
                    "src": b.column("src"),
                    "deg": b.column("deg"),
                    "rank": pa.array(
                        base
                        + damping
                        * b.column("_s").to_numpy(zero_copy_only=False)
                    ),
                }
            ),
            batch_format="pyarrow",
        )

    def fin(b: pa.Table) -> pa.Table:
        r = b.column("rank").to_numpy(zero_copy_only=False)
        if round_to is not None:
            from rp_extract_ray.functions.rounding import round_half_away

            r = round_half_away(r, round_to)
        return pa.table({"node": b.column("src"), "rank": pa.array(r)})

    return state.map_batches(fin, batch_format="pyarrow")


def _closed_triangles(
    edges: Dataset,
    *,
    u_col: str = "u",
    v_col: str = "v",
    num_partitions: int | None = None,
    degree_orient_limit: int = 50_000_000,
    deg: Dataset | None = None,
) -> Dataset:
    """Shared wedge-and-close core: returns the closed-triangle Dataset,
    one row per triangle — ``(_k, _b)`` with ``_k`` the packed (lo_id,
    hi_id) closing edge and ``_b`` the wedge center.

    Orientation: every edge is assigned to its LOWER-RANK endpoint under
    the total order rank(v) = (degree(v), v); wedges form only between a
    center's two HIGHER-rank neighbors, so each triangle materializes
    exactly once (at its min-rank vertex) and the wedge fan-out drops
    from sum(deg_lo * deg_hi) to sum(higher-rank-deg choose 2) — the
    classical O(m^1.5) bound, which is what keeps a power-law hub from
    exploding the candidate set. The rank vector is node-table-sized and
    broadcast (``ray.put``); above ``degree_orient_limit`` nodes the
    orientation falls back to the id order (rank(v) = v) — same truth,
    weaker bound — so the op never requires the driver to hold an
    unbounded table. Ids must fit int32 (packed closing key).
    """
    from rp_extract_ray.stages.groupops import grouped_reduce
    from rp_extract_ray.stages.join import repartition_join
    from rp_extract_ray.stages.partition import partitioned_apply

    # multi-pass (wedge side + closing side): pin the edge blocks once
    edges = edges.materialize()

    refs = None
    if degree_orient_limit:
        if deg is None:
            deg = grouped_reduce(
                _symmetrize(edges, u_col, v_col),
                "src", {"deg": ("dst", "count")},
                num_partitions=num_partitions,
            )
        deg = deg.materialize()  # count() + to_pandas() = ONE execution
        n_nodes = deg.count()
        if 0 < n_nodes <= degree_orient_limit:
            dp = deg.to_pandas().sort_values("src", ignore_index=True)
            nodes = dp["src"].to_numpy()
            order = np.lexsort((nodes, dp["deg"].to_numpy()))
            rank = np.empty(len(nodes), dtype=np.int64)
            rank[order] = np.arange(len(nodes))
            refs = (ray.put(nodes), ray.put(rank))

    def tag(b: pa.Table) -> pa.Table:
        uu = b.column(u_col).to_numpy(zero_copy_only=False).astype(np.int64)
        vv = b.column(v_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(uu) and (uu.min() < 0 or vv.max() >= 2**31):
            raise ValueError("triangle ops require node ids in [0, 2^31)")
        if refs is not None:
            nodes = ray.get(refs[0])
            rank = ray.get(refs[1])
            ru = rank[np.searchsorted(nodes, uu)]
            rv = rank[np.searchsorted(nodes, vv)]
        else:
            ru, rv = uu, vv
        lo_is_u = ru < rv
        return pa.table(
            {
                "_ctr": np.where(lo_is_u, uu, vv),
                "_nb": np.where(lo_is_u, vv, uu),
            }
        )

    def wedges(pdf: pd.DataFrame, starts) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame(
                {"_k": pd.Series([], dtype=np.int64),
                 "_b": pd.Series([], dtype=np.int64)}
            )
        w = pdf.merge(pdf, on="_ctr")
        w = w[w["_nb_x"] < w["_nb_y"]]  # unordered pair once, packed by id
        k = (w["_nb_x"].to_numpy() << np.int64(32)) | w["_nb_y"].to_numpy()
        return pd.DataFrame({"_k": k, "_b": w["_ctr"].to_numpy()})

    cand = partitioned_apply(
        edges.map_batches(tag, batch_format="pyarrow"), wedges,
        entity_col="_ctr", order_cols=("_nb",),
        num_partitions=num_partitions or 32,
    )

    def ekey(b: pa.Table) -> pa.Table:
        uu = b.column(u_col).to_numpy(zero_copy_only=False).astype(np.int64)
        vv = b.column(v_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"_k": (uu << np.int64(32)) | vv})

    return repartition_join(
        cand, edges.map_batches(ekey, batch_format="pyarrow"),
        on="_k", how="semi", num_partitions=num_partitions,
    )


def triangle_count(
    edges: Dataset,
    *,
    u_col: str = "u",
    v_col: str = "v",
    num_partitions: int | None = None,
    degree_orient_limit: int = 50_000_000,
) -> int:
    """Count triangles in an undirected graph given as DISTINCT oriented
    edges (u < v): the :func:`_closed_triangles` wedge-and-close
    (degree-ordered centers, packed-key semi-join — duplicates preserved,
    each surviving wedge row IS one triangle) + a zero-shuffle partial
    count."""
    closed = _closed_triangles(
        edges, u_col=u_col, v_col=v_col, num_partitions=num_partitions,
        degree_orient_limit=degree_orient_limit,
    )

    def cnt(b: pa.Table) -> pa.Table:
        return pa.table({"n": np.array([len(b)], dtype=np.int64)})

    parts = closed.map_batches(cnt, batch_format="pyarrow").to_pandas()
    return int(parts["n"].sum()) if len(parts) else 0


def per_node_triangles(
    edges: Dataset,
    *,
    u_col: str = "u",
    v_col: str = "v",
    num_partitions: int | None = None,
    degree_orient_limit: int = 50_000_000,
    deg: Dataset | None = None,
) -> Dataset:
    """Per-node triangle participation counts: each closed triangle
    (a, b, c) from :func:`_closed_triangles` explodes into its three
    member nodes and ONE keyed count exchange yields ``(node, tri)``.
    Nodes in no triangle are absent (left-join + fill downstream)."""
    from rp_extract_ray.stages.groupops import grouped_reduce

    closed = _closed_triangles(
        edges, u_col=u_col, v_col=v_col, num_partitions=num_partitions,
        degree_orient_limit=degree_orient_limit, deg=deg,
    )

    def explode(b: pa.Table) -> pa.Table:
        k = b.column("_k").to_numpy(zero_copy_only=False)
        bb = b.column("_b").to_numpy(zero_copy_only=False)
        a = k >> np.int64(32)
        c = k & np.int64(0xFFFFFFFF)
        return pa.table({"node": np.concatenate([a, bb, c])})

    return grouped_reduce(
        closed.map_batches(explode, batch_format="pyarrow"),
        "node", {"tri": ("node", "count")},
        num_partitions=num_partitions,
    )


def clustering_coefficient(
    edges: Dataset,
    *,
    u_col: str = "u",
    v_col: str = "v",
    round_to: int | None = None,
    num_partitions: int | None = None,
) -> Dataset:
    """Local clustering coefficient per node: ``2 * tri / (deg * (deg-1))``
    (0.0 for degree-1 nodes — no possible wedge). Degree from one count
    exchange over the symmetrized edges, triangles from
    :func:`per_node_triangles`, stitched with one left-outer
    ``repartition_join`` (absent -> 0 triangles). Output:
    ``(node, deg, triangles, lcc)``."""
    from rp_extract_ray.stages.groupops import grouped_reduce
    from rp_extract_ray.stages.join import repartition_join

    # pin once: the degree pass and the triangle pipeline's two reads all
    # hit the same edge blocks (materialize again inside
    # per_node_triangles is then a no-op)
    edges = edges.materialize()

    # deg is materialized ONCE and shared: it is both the output column
    # and the rank source for the triangle core's degree orientation
    deg = grouped_reduce(
        _symmetrize(edges, u_col, v_col),
        "src", {"deg": ("dst", "count")}, num_partitions=num_partitions,
    ).materialize()
    tri = per_node_triangles(
        edges, u_col=u_col, v_col=v_col, num_partitions=num_partitions,
        deg=deg,
    )
    joined = repartition_join(
        deg, tri, on="src", right_on="node", how="left_outer",
        num_partitions=num_partitions,
        # explicit: a triangle-free graph yields a ZERO-BLOCK tri side
        # whose schema() is None (the empty-Dataset contract)
        right_cols=["node", "tri"],
        # tri has at most one row per node: the materialized deg count is
        # a metadata-only upper bound, so a bounded node table collapses
        # this stitch to the zero-shuffle broadcast merge
        size_hint=deg.count(), broadcast_limit=2_000_000,
    )

    def fin(b: pa.Table) -> pa.Table:
        d = b.column("deg").to_numpy(zero_copy_only=False).astype(np.float64)
        if "tri" not in b.column_names:  # triangle-free graph: no right side
            t = np.full(len(b), np.nan)
        else:
            t = b.column("tri").to_numpy(zero_copy_only=False).astype(
                np.float64
            )
        t = np.where(np.isnan(t), 0.0, t)
        with np.errstate(invalid="ignore", divide="ignore"):
            lcc = np.where(d >= 2, 2.0 * t / (d * (d - 1.0)), 0.0)
        if round_to is not None:
            from rp_extract_ray.functions.rounding import round_half_away

            lcc = round_half_away(lcc, round_to)
        return pa.table(
            {
                "node": b.column("src"),
                "deg": pa.array(d.astype(np.int64)),
                "triangles": pa.array(t.astype(np.int64)),
                "lcc": pa.array(lcc),
            }
        )

    return joined.map_batches(fin, batch_format="pyarrow")
