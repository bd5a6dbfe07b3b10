"""Graph centralities over an edge-list DataFrame (SURVEY §2.7 G2-G4).

The reference builds a networkx.Graph of <=500 genes (pipeline2.py:709-717)
and calls nx.degree_centrality / betweenness_centrality /
eigenvector_centrality (pipeline2.py:747-749). Here the graph is the
idiomatic Spark representation — an undirected edge list ``(src, dst)`` with
``src < dst`` plus a node list — and each centrality is a DataFrame program:

- degree: one aggregate over the symmetrized edge list (any scale).
- eigenvector: power iteration x' = (I + A)·x as iterative join-aggregate,
  L2-normalized, matching networkx's (I+A) iteration/convergence exactly
  (unweighted adjacency — the reference passes no weight kwarg).
- betweenness: exact Brandes, parallelized ACROSS SOURCES — each task runs
  single-source Brandes on a broadcast adjacency (fine while V fits in one
  executor's memory, which the reference's top-K construction guarantees:
  K<=500). Dependencies are summed per node in one final aggregate.

All unweighted, matching nx defaults (hop-count shortest paths).
"""

from __future__ import annotations

from collections import deque

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType


def _symmetrize(edges: DataFrame) -> DataFrame:
    """(src,dst) once per undirected edge -> both directions."""
    return edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def degree_centrality(
    edges: DataFrame, nodes: DataFrame, n_nodes: int | None = None
) -> DataFrame:
    """nx.degree_centrality: degree / (n-1); isolated nodes get 0.0
    (pipeline2.py:747). One aggregate + one broadcastable outer join.
    ``n_nodes``: caller-known node count — the n-1 normalizer needs it
    eagerly, so passing it skips a count() job (optimization r14)."""
    n = n_nodes if n_nodes is not None else nodes.count()
    deg = _symmetrize(edges).groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("_deg")
    )
    return (
        nodes.join(deg, nodes["node"] == deg["node"], "left")
        .select(nodes["node"], F.coalesce("_deg", F.lit(0)).alias("_deg"))
        .withColumn(
            "degree_centrality",
            F.col("_deg").cast("double") / float(max(n - 1, 1)),
        )
        .drop("_deg")
    )


def eigenvector_centrality(
    edges: DataFrame,
    nodes: DataFrame,
    max_iter: int = 1000,
    tol: float = 1.0e-6,
    driver_threshold: int | None = None,
    n_nodes: int | None = None,
) -> DataFrame:
    """nx.eigenvector_centrality parity (pipeline2.py:749): power iteration
    on (I + A) with L2 normalization; converged when sum|x - x_last| < n*tol.

    Two physical strategies, same semantics:
    - **small graph** (< driver_threshold nodes — always true for the
      reference's top-K construction): collect the edge list once and run
      the iteration in numpy on the driver. A 10^6-node vector is ~8 MB;
      per-iteration Spark-job latency would dominate by orders of magnitude.
    - **huge graph**: iterative join-aggregate over cached DataFrames with
      per-iteration localCheckpoint to cut lineage (SURVEY §4). One shuffle per
      iteration.

    ``driver_threshold`` defaults to the module-wide driver-twin policy
    constant (graph/algorithms.py DRIVER_TWIN_THRESHOLD); ``n_nodes`` is
    the caller-known node count — skips the gate's count() job when given
    (optimization r14).
    """
    if driver_threshold is None:
        from drug_target_discovery_spark.graph.algorithms import (
            DRIVER_TWIN_THRESHOLD,
        )

        driver_threshold = DRIVER_TWIN_THRESHOLD
    if n_nodes is None:
        n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.select("node", F.lit(0.0).alias("eigenvector_centrality"))
    if n_nodes < driver_threshold:
        return _eigenvector_driver(edges, nodes, n_nodes, max_iter, tol)
    return _eigenvector_distributed(edges, nodes, max_iter, tol)


def _eigenvector_driver(
    edges: DataFrame, nodes: DataFrame, n: int, max_iter: int, tol: float
) -> DataFrame:
    """numpy power iteration mirroring networkx exactly: x' = x + A·x,
    L2 normalize, stop when sum|x' - x| < n*tol."""
    import numpy as np

    spark = edges.sparkSession
    node_list = [r["node"] for r in nodes.select("node").collect()]
    idx = {v: i for i, v in enumerate(node_list)}
    e = [
        (idx[r["src"]], idx[r["dst"]])
        for r in edges.select("src", "dst").collect()
        if r["src"] in idx and r["dst"] in idx
    ]
    src = np.array([p[0] for p in e], dtype=np.int64)
    dst = np.array([p[1] for p in e], dtype=np.int64)
    x = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        xlast = x
        ax = np.zeros(n)
        np.add.at(ax, dst, xlast[src])
        np.add.at(ax, src, xlast[dst])
        x = xlast + ax
        norm = float(np.sqrt((x * x).sum())) or 1.0
        x = x / norm
        if float(np.abs(x - xlast).sum()) < n * tol:
            break
    else:
        raise RuntimeError(f"eigenvector centrality failed to converge in {max_iter} iterations")
    pdf = pd.DataFrame({"node": node_list, "eigenvector_centrality": x})
    out = spark.createDataFrame(pdf)
    # preserve the node column's original type (createDataFrame may widen)
    return out


def _eigenvector_distributed(
    edges: DataFrame,
    nodes: DataFrame,
    max_iter: int,
    tol: float,
) -> DataFrame:
    """Join-aggregate power iteration for graphs too large to collect."""
    sym = _symmetrize(edges).cache()
    n = nodes.count()
    x = nodes.select("node", F.lit(1.0 / n).alias("x")).cache()
    x.count()

    for it in range(max_iter):
        contrib = (
            sym.join(x, sym["src"] == x["node"])
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("x").alias("ax"))
        )
        # x' = x + A·x  (networkx iterates on I+A)
        x_new = (
            x.join(contrib, "node", "left")
            .select("node", (F.col("x") + F.coalesce("ax", F.lit(0.0))).alias("x"))
        )
        norm = x_new.agg(F.sqrt(F.sum(F.col("x") * F.col("x"))).alias("n")).collect()[0]["n"]
        norm = norm if norm and norm > 0 else 1.0
        x_new = x_new.select("node", (F.col("x") / F.lit(norm)).alias("x"))
        # Truncate lineage EVERY iteration. cache() is not enough: each
        # generation's plan embeds the previous generation's cached plan
        # TWICE (the x branch and the contrib branch), so the analyzed tree
        # doubles per iteration and Spark's per-action plan-description
        # (generateTreeString) goes exponential — measured dominating the
        # 50K-node probe's driver CPU. localCheckpoint resets the plan to a
        # LogicalRDD scan at the cost of one materialization we were paying
        # via cache() anyway. (On a cluster with executor loss, swap for
        # reliable checkpoint() with a checkpoint dir.)
        x_new = x_new.localCheckpoint(eager=True)
        delta = (
            x_new.alias("a")
            .join(x.alias("b"), "node")
            .agg(F.sum(F.abs(F.col("a.x") - F.col("b.x"))).alias("d"))
            .collect()[0]["d"]
        )
        x.unpersist()
        x = x_new
        if delta < n * tol:
            break
    else:
        raise RuntimeError(f"eigenvector centrality failed to converge in {max_iter} iterations")
    sym.unpersist()
    from drug_target_discovery_spark.caching import track

    track(x)  # surviving generation stays cached for the consumer's action
    return x.select("node", F.col("x").alias("eigenvector_centrality"))


def _brandes_single_source(adj: dict, s) -> dict:
    """Exact single-source dependency accumulation (Brandes 2001, unweighted).
    Returns {node: dependency_from_s}. Pure-Python; runs inside one task."""
    S = []
    P = {v: [] for v in adj}
    sigma = dict.fromkeys(adj, 0.0)
    sigma[s] = 1.0
    dist = dict.fromkeys(adj, -1)
    dist[s] = 0
    Q = deque([s])
    while Q:
        v = Q.popleft()
        S.append(v)
        for w in adj[v]:
            if dist[w] < 0:
                dist[w] = dist[v] + 1
                Q.append(w)
            if dist[w] == dist[v] + 1:
                sigma[w] += sigma[v]
                P[w].append(v)
    delta = dict.fromkeys(adj, 0.0)
    while S:
        w = S.pop()
        for v in P[w]:
            delta[v] += sigma[v] / sigma[w] * (1.0 + delta[w])
    delta[s] = 0.0
    return delta


def centralities_fused_driver(
    edges: DataFrame, nodes: DataFrame, normalized: bool = True
) -> pd.DataFrame:
    """All three centralities from ONE edge-list collect, computed on the
    driver — the small-graph fast path (the reference's top-K construction
    bounds the graph at n_top_genes<=500 nodes, pipeline2.py:663).

    Running degree + eigenvector + betweenness as separate DataFrame
    programs costs ~20 tiny Spark jobs on a bounded graph; one collect plus
    numpy/pure-Python is the same arithmetic with two jobs. The distributed
    functions below remain the scale path for graphs that don't fit.

    Returns a pandas DataFrame (node, degree_centrality,
    betweenness_centrality, eigenvector_centrality) with the exact networkx
    conventions of the individual functions."""
    import numpy as np

    node_list = [r["node"] for r in nodes.select("node").collect()]
    n = len(node_list)
    if n == 0:
        # empty graph: the power iteration below would never satisfy
        # sum|dx| < n*tol (0 < 0) — return the empty typed frame directly
        return pd.DataFrame(
            {
                "node": pd.Series([], dtype=object),
                "degree_centrality": pd.Series([], dtype="float64"),
                "betweenness_centrality": pd.Series([], dtype="float64"),
                "eigenvector_centrality": pd.Series([], dtype="float64"),
            }
        )
    idx = {v: i for i, v in enumerate(node_list)}
    adj: dict = {v: [] for v in node_list}
    pairs = []
    for r in edges.select("src", "dst").collect():
        s, d = r["src"], r["dst"]
        if s in idx and d in idx:
            adj[s].append(d)
            adj[d].append(s)
            pairs.append((idx[s], idx[d]))
    # degree: deg / (n-1)
    deg = np.array([len(adj[v]) for v in node_list], dtype=np.float64)
    degree = deg / float(max(n - 1, 1))
    # eigenvector: power iteration on (I + A), L2 normalized (nx parity)
    src = np.array([p[0] for p in pairs], dtype=np.int64)
    dst = np.array([p[1] for p in pairs], dtype=np.int64)
    x = np.full(n, 1.0 / n) if n else np.zeros(0)
    for _ in range(1000):
        xlast = x
        ax = np.zeros(n)
        np.add.at(ax, dst, xlast[src])
        np.add.at(ax, src, xlast[dst])
        x = xlast + ax
        norm = float(np.sqrt((x * x).sum())) or 1.0
        x = x / norm
        if float(np.abs(x - xlast).sum()) < n * 1.0e-6:
            break
    else:
        raise RuntimeError("eigenvector centrality failed to converge in 1000 iterations")
    # betweenness: exact Brandes over every source
    bc = dict.fromkeys(node_list, 0.0)
    for s in node_list:
        for v, dep in _brandes_single_source(adj, s).items():
            if dep:
                bc[v] += dep
    scale = 0.5
    if normalized and n > 2:
        scale *= 2.0 / ((n - 1) * (n - 2))
    betweenness = np.array([bc[v] * scale for v in node_list])
    return pd.DataFrame(
        {
            "node": node_list,
            "degree_centrality": degree,
            "betweenness_centrality": betweenness,
            "eigenvector_centrality": x,
        }
    )


def betweenness_centrality(
    edges: DataFrame,
    nodes: DataFrame,
    normalized: bool = True,
    driver_threshold: int = 512,
) -> DataFrame:
    """Exact betweenness (pipeline2.py:748), parallel across sources.

    The adjacency (node -> neighbor list) is broadcast to every task; sources
    are distributed via the nodes DataFrame, each task accumulates Brandes
    dependencies for its sources (applyInPandas), and a final groupBy sums
    per node. Undirected: pair dependencies halve; normalized scale
    2/((n-1)(n-2)) — networkx conventions.

    Scale envelope: V must fit per-executor (broadcast adjacency); source
    fan-out is embarrassingly parallel. For the reference's top-K<=500 graph
    this is overkill; it holds to ~10^6 nodes / arbitrary source counts.
    """
    spark = edges.sparkSession
    node_rows = [r["node"] for r in nodes.select("node").collect()]
    adj: dict = {v: [] for v in node_rows}
    for r in edges.select("src", "dst").collect():
        if r["src"] in adj and r["dst"] in adj:
            adj[r["src"]].append(r["dst"])
            adj[r["dst"]].append(r["src"])
    n = len(node_rows)

    node_field = nodes.select("node").schema.fields[0]
    result_schema = StructType(
        [node_field, StructField("betweenness_centrality", DoubleType(), False)]
    )
    if n <= driver_threshold:
        # Small-graph driver path: the adjacency is already collected (it is
        # the broadcast payload either way), and at <=512 sources serial
        # Brandes in Python beats the mapInPandas fan-out's worker-startup +
        # shuffle overhead by seconds. Same numbers as the distributed path
        # (equivalence pinned in tests/test_graph.py); larger graphs keep
        # the source-parallel plan.
        bc_acc = dict.fromkeys(node_rows, 0.0)
        for s in node_rows:
            for v, dep in _brandes_single_source(adj, s).items():
                if dep:
                    bc_acc[v] += dep
        scale = 0.5
        if normalized and n > 2:
            scale *= 2.0 / ((n - 1) * (n - 2))
        return spark.createDataFrame(
            [(v, bc_acc[v] * scale) for v in node_rows], schema=result_schema
        )
    badj = spark.sparkContext.broadcast(adj)
    out_schema = StructType([node_field, StructField("dep", DoubleType(), False)])

    def per_source_batch(pdf_iter):
        adj_local = badj.value
        for pdf in pdf_iter:
            acc: dict = {}
            for s in pdf["node"]:
                for v, d in _brandes_single_source(adj_local, s).items():
                    if d:
                        acc[v] = acc.get(v, 0.0) + d
            if acc:
                yield pd.DataFrame({"node": list(acc.keys()), "dep": list(acc.values())})

    sources = nodes.select("node").repartition(min(max(n // 8, 1), 64))
    deps = sources.mapInPandas(per_source_batch, schema=out_schema)
    summed = deps.groupBy("node").agg(F.sum("dep").alias("bc"))
    scale = 1.0 / 2.0  # undirected: each pair counted from both endpoints
    if normalized and n > 2:
        scale *= 2.0 / ((n - 1) * (n - 2))
    result = (
        nodes.join(summed, "node", "left")
        .select(
            "node",
            (F.coalesce("bc", F.lit(0.0)) * F.lit(scale)).alias("betweenness_centrality"),
        )
    )
    return result


def _closeness_single_source(adj: dict, s, n: int) -> float:
    """Single-source BFS closeness, networkx wf_improved semantics:
    (r-1)/totsp * (r-1)/(n-1) with r = nodes reached incl. s; 0.0 for
    isolated sources. Pure-Python; runs inside one task."""
    dist = {s: 0}
    Q = deque([s])
    tot = 0
    while Q:
        v = Q.popleft()
        for w in adj[v]:
            if w not in dist:
                dist[w] = dist[v] + 1
                tot += dist[w]
                Q.append(w)
    r = len(dist)
    if r <= 1 or tot == 0 or n <= 1:
        return 0.0
    return ((r - 1) / tot) * ((r - 1) / (n - 1))


def closeness_centrality(
    edges: DataFrame,
    nodes: DataFrame,
    driver_threshold: int = 512,
) -> DataFrame:
    """Exact closeness centrality [EXT] — networkx conventions
    (wf_improved: the per-component closeness scaled by the reachable
    fraction, so multi-component graphs don't inflate small components).

    Unlike Brandes, each source's BFS yields ITS OWN closeness — no
    cross-source accumulation at all, so the source-parallel plan is one
    mapInPandas over the node list (broadcast adjacency, same scale
    envelope as betweenness: V fits per executor, sources embarrassingly
    parallel) with NO final shuffle. Driver path below the threshold for
    the same reason as Brandes (worker startup dominates tiny graphs);
    equivalence pinned in tests/test_graph.py."""
    spark = edges.sparkSession
    node_rows = [r["node"] for r in nodes.select("node").collect()]
    adj: dict = {v: [] for v in node_rows}
    for r in edges.select("src", "dst").collect():
        if r["src"] in adj and r["dst"] in adj:
            adj[r["src"]].append(r["dst"])
            adj[r["dst"]].append(r["src"])
    n = len(node_rows)
    node_field = nodes.select("node").schema.fields[0]
    result_schema = StructType(
        [node_field, StructField("closeness_centrality", DoubleType(), False)]
    )
    if n <= driver_threshold:
        return spark.createDataFrame(
            [(v, _closeness_single_source(adj, v, n)) for v in node_rows],
            schema=result_schema,
        )
    badj = spark.sparkContext.broadcast(adj)

    def per_source_batch(pdf_iter):
        adj_local = badj.value
        for pdf in pdf_iter:
            src = list(pdf["node"])
            yield pd.DataFrame(
                {
                    "node": src,
                    "closeness_centrality": [
                        _closeness_single_source(adj_local, s, n) for s in src
                    ],
                }
            )

    sources = nodes.select("node").repartition(min(max(n // 8, 1), 64))
    return sources.mapInPandas(per_source_batch, schema=result_schema)


def _harmonic_single_source(adj: dict, s) -> float:
    """Single-source BFS harmonic centrality, networkx conventions
    (raw sum of 1/d over reachable v != s, NO (n-1) normalization).
    The reciprocal sum is accumulated per-DISTANCE (integer level
    counts, then sum count_d/d in ascending d) so the float result is
    order-deterministic — independent of adjacency iteration order."""
    dist = {s: 0}
    Q = deque([s])
    level_counts: dict[int, int] = {}
    while Q:
        v = Q.popleft()
        for w in adj[v]:
            if w not in dist:
                d = dist[v] + 1
                dist[w] = d
                level_counts[d] = level_counts.get(d, 0) + 1
                Q.append(w)
    h = 0.0
    for d in sorted(level_counts):
        h += level_counts[d] / d
    return h


def harmonic_centrality(
    edges: DataFrame,
    nodes: DataFrame,
    driver_threshold: int = 512,
) -> DataFrame:
    """Exact harmonic centrality [EXT] — networkx conventions (sum of
    reciprocal distances; well-defined on disconnected graphs, the
    reason Boldi & Vigna 2014 prefer it over closeness). Same execution
    envelope as ``closeness_centrality``: each source's BFS yields its
    own score, so the distributed path is one mapInPandas over the node
    list with a broadcast adjacency and NO final shuffle; driver path
    below the threshold where worker startup dominates. Per-distance
    integer level counts make each score order-deterministic (see
    ``_harmonic_single_source``)."""
    spark = edges.sparkSession
    node_rows = [r["node"] for r in nodes.select("node").collect()]
    adj: dict = {v: [] for v in node_rows}
    for r in edges.select("src", "dst").collect():
        if r["src"] in adj and r["dst"] in adj:
            adj[r["src"]].append(r["dst"])
            adj[r["dst"]].append(r["src"])
    n = len(node_rows)
    node_field = nodes.select("node").schema.fields[0]
    result_schema = StructType(
        [node_field, StructField("harmonic_centrality", DoubleType(), False)]
    )
    if n <= driver_threshold:
        return spark.createDataFrame(
            [(v, _harmonic_single_source(adj, v)) for v in node_rows],
            schema=result_schema,
        )
    badj = spark.sparkContext.broadcast(adj)

    def per_source_batch(pdf_iter):
        adj_local = badj.value
        for pdf in pdf_iter:
            src = list(pdf["node"])
            yield pd.DataFrame(
                {
                    "node": src,
                    "harmonic_centrality": [
                        _harmonic_single_source(adj_local, s) for s in src
                    ],
                }
            )

    sources = nodes.select("node").repartition(min(max(n // 8, 1), 64))
    return sources.mapInPandas(per_source_batch, schema=result_schema)
