"""Distributed Lloyd k-means over an embedding column.

The reference pipeline presumes clustering happens upstream (its SemDeDup
stage consumes precomputed cluster ids); this operator provides the
training loop itself as the standard driver-coordinated Lloyd iteration
every distributed ML system uses (MLlib KMeans runs the same shape via
treeAggregate): broadcast the K×D centroid table, compute per-partition
sufficient statistics with an Arrow-batched kernel, collect only the
K×(D+1) partial-sum table per iteration, update centroids driver-side.

Exactness contract (what lets a numpy fixture oracle check this to the
last digit): embeddings are quantized to integer micro-units map-side, so
the M-step sums are exact int64 arithmetic in ANY accumulation order, and
the mean (int sum / int count) is one deterministic IEEE division. The
assignment step compares per-centroid squared distances accumulated in a
fixed per-row order (numpy reduces each row independently), with ties
broken toward the smaller cluster id. Nothing in the loop depends on
partitioning, batch sizes, or thread count.

Scale design: per iteration the shuffle is O(batches × K × D) partial
sums — corpus size only affects the map side. The K×D collect is bounded
by the model size (same argument as the PCA query's D×D cell table), and
the centroid table re-broadcast each round is K×D doubles.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUANT_SCALE = 1_000_000  # micro-units: float32 inputs are exact in double


def quantize_embeddings(emb: DataFrame, id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """(id, v_int array<long>): element-wise floor(v * S + 0.5)."""
    return emb.select(
        F.col(id_col).alias("vid"),
        F.expr(
            f"transform({vec_col}, x -> CAST(floor(CAST(x AS DOUBLE) * {QUANT_SCALE} + 0.5) AS BIGINT))"
        ).alias("v_int"),
    )


def _assign_ids(pdf_v, centroids):
    """Row-wise nearest centroid in micro-unit space; ties -> smaller id.

    One vectorized pass per centroid; each row's squared distance reduces
    over the D axis independently of batch composition, so the argmin is
    batch-invariant.
    """
    import numpy as np

    best_d = None
    best_i = None
    for j, c in enumerate(centroids):
        d = ((pdf_v - np.asarray(c, dtype=np.float64)) ** 2).sum(axis=1)
        if best_d is None:
            best_d, best_i = d, np.zeros(len(d), dtype=np.int64)
        else:
            upd = d < best_d  # strict: ties keep the smaller existing id
            best_d = np.where(upd, d, best_d)
            best_i = np.where(upd, j, best_i)
    return best_i


def _partial_stats_kernel(centroids):
    """mapInPandas kernel: per batch, (cluster, dim, s) int64 partial sums
    plus a (cluster, -1, count) row — K*(D+1) rows per batch."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack(pdf["v_int"].map(lambda a: np.asarray(a, dtype=np.int64)))
            lab = _assign_ids(V.astype(np.float64), centroids)
            out_c, out_d, out_s = [], [], []
            for j in range(len(centroids)):
                m = lab == j
                n = int(m.sum())
                if n == 0:
                    continue
                s = V[m].sum(axis=0)  # exact int64
                out_c.extend([j] * (len(s) + 1))
                out_d.extend(list(range(len(s))) + [-1])
                out_s.extend([int(x) for x in s] + [n])
            yield pd.DataFrame({"cluster": out_c, "dim": out_d, "s": out_s})

    return kernel


_STATS_SCHEMA = "cluster INT, dim INT, s BIGINT"


def lloyd_iterations(vq: DataFrame, k: int, iters: int) -> list[list[float]]:
    """Run `iters` Lloyd rounds; return the final centroids (micro-unit
    doubles). Init: the vectors with the k smallest ids (deterministic).
    A cluster that loses every member keeps its previous centroid."""
    init = (
        vq.orderBy("vid").limit(k).orderBy("vid").collect()
    )
    centroids = [[float(x) for x in r["v_int"]] for r in init]
    for _ in range(iters):
        stats = (
            vq.mapInPandas(_partial_stats_kernel(centroids), schema=_STATS_SCHEMA)
            .groupBy("cluster", "dim")
            .agg(F.sum("s").alias("s"))
            .collect()
        )
        sums: dict[int, dict[int, int]] = {}
        for r in stats:
            sums.setdefault(r["cluster"], {})[r["dim"]] = r["s"]
        new = []
        for j in range(k):
            cj = sums.get(j)
            if not cj or cj.get(-1, 0) == 0:
                new.append(centroids[j])
                continue
            n = cj[-1]
            new.append([cj[d] / n for d in range(len(centroids[j]))])
        centroids = new
    return centroids


def final_assignment(vq: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """(vid, cluster) under the given centroids — Arrow-batched, map-only."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack(pdf["v_int"].map(lambda a: np.asarray(a, dtype=np.float64)))
            lab = _assign_ids(V, centroids)
            yield pd.DataFrame({"vid": pdf["vid"].to_numpy(), "cluster": lab})

    return vq.mapInPandas(kernel, schema="vid BIGINT, cluster INT")
