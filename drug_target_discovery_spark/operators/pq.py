"""Product quantization (Jegou, Douze, Schmid 2011, "Product Quantization
for Nearest Neighbor Search") over an embedding column — the compression
leg of the ANN story (IVF coarse cells -> PQ fine codes -> measured
recall), with the kmeans operator's exactness contract so a numpy oracle
can check every stage to the last digit.

Exactness contract:
- inputs are the kmeans operator's micro-unit integer vectors
  (quantize_embeddings), so M-step sums are exact int64 in ANY
  accumulation order and each centroid coordinate is one deterministic
  IEEE division (int sum / int count);
- subspace assignment compares per-centroid squared distances with a
  fixed per-row reduction order and ties broken toward the smaller code
  (kmeans._assign_ids, reused verbatim);
- the EXACT top-k leg ranks by integer squared L2 (int64 — no float ever
  enters), the ADC leg by a float64 sum over the m subspace LUT entries
  in fixed subspace order; both legs break distance ties toward the
  smaller vector id, so both rankings are total orders independent of
  partitioning.

Scale design:
- TRAINING: one fused Arrow-batched scan per Lloyd iteration computes the
  partial sums for ALL m subspaces at once — the shuffle per iteration is
  O(batches x m x k x (d_sub + 1)) integer partials (model-sized, never
  corpus-sized), against m separate scans for a naive per-subspace loop.
  The m x k x d codebook collect is bounded by the model, exactly the
  kmeans/PCA argument.
- EVAL: codebooks + the (bounded) probe-query set broadcast; ONE scan
  computes codes, per-query ADC distances via the per-query m x k lookup
  table (the PQ trick: distance = sum of m LUT entries, no full-vector
  arithmetic per candidate), and integer exact distances, emitting only
  each batch's local top-k per (leg, query) — O(batches x queries x k)
  rows ever shuffle, then a domain-bounded window takes the global top-k.
  No corpus-sized sort, no corpus-sized window partition.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from drug_target_discovery_spark.operators.kmeans import _assign_ids

_TRAIN_SCHEMA = "sub INT, cluster INT, dim INT, s BIGINT"


def _split(dims: int, m: int) -> list[tuple[int, int]]:
    """Subspace dim ranges [(lo, hi)); dims must divide evenly by m."""
    if dims % m:
        raise ValueError(f"dims={dims} not divisible by m={m}")
    d = dims // m
    return [(j * d, (j + 1) * d) for j in range(m)]


def _train_kernel(codebooks, spans):
    """mapInPandas kernel: per batch, (sub, cluster, dim, s) int64 partial
    sums for every subspace, plus (sub, cluster, -1, count) rows."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack(pdf["v_int"].map(lambda a: np.asarray(a, dtype=np.int64)))
            out_j, out_c, out_d, out_s = [], [], [], []
            for j, (lo, hi) in enumerate(spans):
                Vs = V[:, lo:hi]
                lab = _assign_ids(Vs.astype(np.float64), codebooks[j])
                for c in range(len(codebooks[j])):
                    mask = lab == c
                    n = int(mask.sum())
                    if n == 0:
                        continue
                    s = Vs[mask].sum(axis=0)  # exact int64
                    out_j.extend([j] * (len(s) + 1))
                    out_c.extend([c] * (len(s) + 1))
                    out_d.extend(list(range(len(s))) + [-1])
                    out_s.extend([int(x) for x in s] + [n])
            yield pd.DataFrame(
                {"sub": out_j, "cluster": out_c, "dim": out_d, "s": out_s}
            )

    return kernel


def pq_train(vq: DataFrame, m: int, k: int, iters: int) -> list[list[list[float]]]:
    """Train m per-subspace codebooks of k centroids each with the fused
    Lloyd loop; returns codebooks[m][k][d_sub] in micro-unit doubles.
    Init: each subspace starts from the sub-vectors of the k smallest ids
    (deterministic, the kmeans operator's rule); a code that loses every
    member keeps its previous centroid."""
    if m < 1 or k < 1:
        raise ValueError(f"pq_train: m={m} and k={k} must both be >= 1")
    first = vq.orderBy("vid").limit(k).orderBy("vid").collect()
    # Degenerate-input fuse (ADVICE r10): an empty corpus, or one with
    # fewer than k vectors, would otherwise fail deep in the update loop
    # (IndexError at codebooks[j][c]) instead of naming the real problem.
    if len(first) < k:
        raise ValueError(
            f"pq_train: corpus holds {len(first)} vectors but k={k} "
            "centroids per subspace were requested; supply k <= n vectors"
        )
    dims = len(first[0]["v_int"])
    spans = _split(dims, m)
    codebooks = [
        [[float(x) for x in r["v_int"][lo:hi]] for r in first] for lo, hi in spans
    ]
    for _ in range(iters):
        stats = (
            vq.mapInPandas(_train_kernel(codebooks, spans), schema=_TRAIN_SCHEMA)
            .groupBy("sub", "cluster", "dim")
            .agg(F.sum("s").alias("s"))
            .collect()
        )
        sums: dict[tuple[int, int], dict[int, int]] = {}
        for r in stats:
            sums.setdefault((r["sub"], r["cluster"]), {})[r["dim"]] = r["s"]
        new = []
        for j, (lo, hi) in enumerate(spans):
            cb = []
            for c in range(k):
                cell = sums.get((j, c))
                if not cell or cell.get(-1, 0) == 0:
                    cb.append(codebooks[j][c])
                    continue
                n = cell[-1]
                cb.append([cell[d] / n for d in range(hi - lo)])
            new.append(cb)
        codebooks = new
    return codebooks


def pq_encode(vq: DataFrame, codebooks: list[list[list[float]]]) -> DataFrame:
    """(vid, codes array<int>) — each vector's nearest code per subspace
    under the given codebooks. Map-only Arrow-batched scan."""
    dims = sum(len(cb[0]) for cb in codebooks)
    spans = _split(dims, len(codebooks))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack(pdf["v_int"].map(lambda a: np.asarray(a, dtype=np.float64)))
            codes = [
                _assign_ids(V[:, lo:hi], codebooks[j])
                for j, (lo, hi) in enumerate(spans)
            ]
            yield pd.DataFrame(
                {
                    "vid": pdf["vid"].to_numpy(),
                    "codes": list(np.stack(codes, axis=1).astype("int32")),
                }
            )

    return vq.mapInPandas(kernel, schema="vid BIGINT, codes ARRAY<INT>")


# ---------------------------------------------------------------------------
# IVF-PQ composition (IVFADC — Jegou et al. 2011 §V): coarse cells restrict
# the candidate set, PQ codes of the RESIDUAL (vector - cell centroid)
# provide the compressed distance. The cell rule is the repo's deterministic
# 8-cell sign-bit quantizer (similarity.py's IVF family), so the composition
# needs no coarse training; cell centroids are exact-integer means so
# residuals stay int64 and the whole pipeline keeps the exactness contract.
# ---------------------------------------------------------------------------


def ivf_cells(vq: DataFrame) -> DataFrame:
    """(vid, v_int, cell): the sign-bit cell of micro-unit dims 1-3."""
    bit = lambda i, w: F.when(F.element_at("v_int", i) > 0, F.lit(w)).otherwise(
        F.lit(0)
    )
    return vq.withColumn("cell", (bit(1, 4) + bit(2, 2) + bit(3, 1)).cast("int"))


def ivf_cell_centroids(cells: DataFrame) -> dict[int, list[int]]:
    """Exact-integer per-cell centroids: elementwise round-half-up mean
    (2*s + n) // (2*n) computed on exact int64 sums — deterministic in any
    accumulation order. The shuffle is map-side-combined to
    8 cells x D dims partials; only the 8 x D table is collected."""
    stats = (
        cells.select("cell", F.posexplode("v_int").alias("dim", "x"))
        .groupBy("cell", "dim")
        .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    acc: dict[int, dict[int, tuple[int, int]]] = {}
    for r in stats:
        acc.setdefault(r["cell"], {})[r["dim"]] = (int(r["s"]), int(r["n"]))
    out = {}
    for cell, dims in acc.items():
        vec = []
        for d in range(len(dims)):
            s, n = dims[d]
            # round-half-up integer mean, exact for negatives too:
            # floor((2s + n) / 2n) == floor(s/n + 1/2)
            vec.append((2 * s + n) // (2 * n))
        out[cell] = vec
    return out


def ivfpq_recall_eval(
    vq: DataFrame,
    m: int,
    k: int,
    iters: int,
    queries: list[tuple[int, list[int]]],
    topk: int,
    nprobe: int,
) -> DataFrame:
    """IVFADC end to end: assign sign-bit cells, train ONE shared PQ
    codebook set on the integer RESIDUALS (vector - its cell's exact
    integer centroid — the standard IVFADC factoring: residuals are
    centered, so one codebook serves every cell), then for each probe
    query search only its ``nprobe`` nearest cells by ADC over the
    residual codes, against the exact integer-L2 top-k over the WHOLE
    corpus. Output per query: (query_vid, n_overlap, recall_at_k,
    scan_frac) — scan_frac is the fraction of the corpus the probed
    cells actually contain, the honest cost side of the recall number.

    ADC under residuals: for candidate x in cell c with codes b,
    dist(q, x) ~ sum_j LUT[q][c][j][b_j] where LUT[q][c][j][code] =
    || (q - centroid_c)_sub_j - codebook_j[code] ||^2 — per query a
    bounded nprobe x m x k table, built driver-side in fixed order.

    Scale design: centroids are one map-side-combined 8 x D aggregate;
    residuals are a JVM-side zip_with against a broadcast 8-row dim
    table; PQ training shuffles model-sized partials (pq_train); eval
    is ONE scan emitting batch-local top-k per (leg, query) — the
    non-probed cells never enter the ADC leg's candidate set at all,
    exactly like a real IVF index skips their posting lists."""
    import numpy as np

    cells = ivf_cells(vq)
    cents = ivf_cell_centroids(cells)
    spark = vq.sparkSession
    cent_df = spark.createDataFrame(
        [(c, v) for c, v in sorted(cents.items())], "cell INT, c_int ARRAY<BIGINT>"
    )
    fact = cells.join(F.broadcast(cent_df), "cell").select(
        "vid",
        "cell",
        "v_int",
        F.zip_with("v_int", "c_int", lambda a, b: a - b).alias("r_int"),
    )
    codebooks = pq_train(
        fact.select("vid", F.col("r_int").alias("v_int")), m, k, iters
    )

    dims = sum(len(cb[0]) for cb in codebooks)
    spans = _split(dims, m)
    cb_np = [np.asarray(cb, dtype=np.float64) for cb in codebooks]
    cent_np = {c: np.asarray(v, dtype=np.int64) for c, v in cents.items()}
    cell_ids = sorted(cent_np)
    q_ids = [int(qid) for qid, _ in queries]
    q_int = [np.asarray(qv, dtype=np.int64) for _, qv in queries]
    # probed cells per query: nprobe nearest centroids by exact integer L2,
    # ties toward the smaller cell id
    probed: list[list[int]] = []
    luts: list[dict[int, "np.ndarray"]] = []
    for q in q_int:
        d_cell = sorted(
            (int(((q - cent_np[c]) ** 2).sum()), c) for c in cell_ids
        )
        mine = [c for _, c in d_cell[:nprobe]]
        probed.append(mine)
        lut_q = {}
        for c in mine:
            qr = (q - cent_np[c]).astype(np.float64)
            lut_q[c] = np.stack(
                [
                    ((qr[lo:hi] - cb_np[j]) ** 2).sum(axis=1)
                    for j, (lo, hi) in enumerate(spans)
                ]
            )
        luts.append(lut_q)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack(pdf["v_int"].map(lambda a: np.asarray(a, dtype=np.int64)))
            R = np.stack(pdf["r_int"].map(lambda a: np.asarray(a, dtype=np.int64)))
            vids = pdf["vid"].to_numpy()
            cell_col = pdf["cell"].to_numpy()
            codes = np.stack(
                [
                    _assign_ids(R[:, lo:hi].astype(np.float64), codebooks[j])
                    for j, (lo, hi) in enumerate(spans)
                ],
                axis=1,
            )
            rows = {"qid": [], "vid": [], "leg": [], "d_int": [], "d_f": []}
            for qi, qid in enumerate(q_ids):
                keep = vids != qid
                if keep.any():
                    v_keep = vids[keep]
                    diff = V[keep] - q_int[qi]
                    d_exact = (diff * diff).sum(axis=1)
                    order = np.lexsort((v_keep, d_exact))[:topk]
                    rows["qid"].extend([qid] * len(order))
                    rows["vid"].extend(int(v) for v in v_keep[order])
                    rows["leg"].extend(["exact"] * len(order))
                    rows["d_int"].extend(int(d) for d in d_exact[order])
                    rows["d_f"].extend([0.0] * len(order))
                # ADC leg: candidates restricted to the probed cells
                in_probe = keep & np.isin(cell_col, probed[qi])
                if in_probe.any():
                    v_adc = vids[in_probe]
                    c_adc = codes[in_probe]
                    cells_adc = cell_col[in_probe]
                    d_adc = np.zeros(len(v_adc), dtype=np.float64)
                    for c in probed[qi]:
                        mask = cells_adc == c
                        if not mask.any():
                            continue
                        lut = luts[qi][c]
                        dd = np.zeros(int(mask.sum()), dtype=np.float64)
                        cc = c_adc[mask]
                        for j in range(m):
                            dd += lut[j][cc[:, j]]
                        d_adc[mask] = dd
                    order = np.lexsort((v_adc, d_adc))[:topk]
                    rows["qid"].extend([qid] * len(order))
                    rows["vid"].extend(int(v) for v in v_adc[order])
                    rows["leg"].extend(["adc"] * len(order))
                    rows["d_int"].extend([0] * len(order))
                    rows["d_f"].extend(float(d) for d in d_adc[order])
            yield pd.DataFrame(rows)

    local = fact.mapInPandas(
        kernel, schema="qid BIGINT, vid BIGINT, leg STRING, d_int BIGINT, d_f DOUBLE"
    )
    w = W.partitionBy("leg", "qid").orderBy("d_int", "d_f", "vid")
    top = (
        local.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= topk)
        .select("qid", "vid", "leg")
    )
    exact = top.filter(F.col("leg") == "exact").select("qid", "vid")
    adc = top.filter(F.col("leg") == "adc").select("qid", "vid")
    hits = exact.join(adc, ["qid", "vid"]).groupBy("qid").agg(
        F.count(F.lit(1)).alias("n_overlap")
    )
    base = exact.groupBy("qid").agg(F.count(F.lit(1)).alias("n_exact"))
    # scan fraction per query: probed-cell population / corpus (bounded:
    # the cell census is 8 rows; the per-query expansion |Q| x nprobe)
    census = {
        int(r["cell"]): int(r["n"])
        for r in cells.groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    total = sum(census.values())
    scan = spark.createDataFrame(
        [
            (qid, sum(census.get(c, 0) for c in probed[qi]) * 1.0 / total)
            for qi, qid in enumerate(q_ids)
        ],
        "qid BIGINT, scan_frac DOUBLE",
    )
    return (
        base.join(hits, "qid", "left")
        .join(F.broadcast(scan), "qid")
        .select(
            F.col("qid").alias("query_vid"),
            F.coalesce(F.col("n_overlap"), F.lit(0)).cast("int").alias("n_overlap"),
            (F.coalesce(F.col("n_overlap"), F.lit(0)) * 1.0 / F.col("n_exact")).alias(
                "recall_at_k"
            ),
            "scan_frac",
        )
        .orderBy("query_vid")
    )


def pq_recall_eval(
    vq: DataFrame,
    codebooks: list[list[list[float]]],
    queries: list[tuple[int, list[int]]],
    topk: int,
) -> DataFrame:
    """recall@topk of PQ/ADC search against exact integer L2, one row per
    probe query: (query_vid, n_overlap, recall_at_k).

    Candidates exclude the query vector itself (standard eval protocol —
    self-matches inflate recall). ADC distance for candidate x is
    sum_j LUT[q][j][code_j(x)] with LUT[q][j][c] = ||q_sub - c||^2 — the
    candidate's full vector is never touched, which is the entire point
    of PQ at serving time."""
    import numpy as np

    dims = sum(len(cb[0]) for cb in codebooks)
    spans = _split(dims, len(codebooks))
    k_codes = len(codebooks[0])
    # Per-query LUT: luts[q][j][c], float64, fixed construction order.
    cb_np = [np.asarray(cb, dtype=np.float64) for cb in codebooks]
    luts = []
    for _, qv in queries:
        q = np.asarray(qv, dtype=np.float64)
        luts.append(
            np.stack(
                [((q[lo:hi] - cb_np[j]) ** 2).sum(axis=1) for j, (lo, hi) in enumerate(spans)]
            )
        )
    q_ids = [int(qid) for qid, _ in queries]
    q_int = [np.asarray(qv, dtype=np.int64) for _, qv in queries]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack(pdf["v_int"].map(lambda a: np.asarray(a, dtype=np.int64)))
            vids = pdf["vid"].to_numpy()
            codes = np.stack(
                [
                    _assign_ids(V[:, lo:hi].astype(np.float64), codebooks[j])
                    for j, (lo, hi) in enumerate(spans)
                ],
                axis=1,
            )
            rows = {"qid": [], "vid": [], "leg": [], "d_int": [], "d_f": []}
            for qi, qid in enumerate(q_ids):
                keep = vids != qid
                if not keep.any():
                    continue
                v_keep = vids[keep]
                # exact leg: integer squared L2 (int64 end to end)
                diff = V[keep] - q_int[qi]
                d_exact = (diff * diff).sum(axis=1)
                # ADC leg: m LUT lookups summed in fixed subspace order
                lut = luts[qi]
                c = codes[keep]
                d_adc = np.zeros(len(v_keep), dtype=np.float64)
                for j in range(len(spans)):
                    d_adc += lut[j][c[:, j]]
                for leg, key in (("exact", d_exact), ("adc", d_adc)):
                    # local top-k: order by (distance, vid)
                    order = np.lexsort((v_keep, key))[:topk]
                    rows["qid"].extend([qid] * len(order))
                    rows["vid"].extend(int(v) for v in v_keep[order])
                    rows["leg"].extend([leg] * len(order))
                    rows["d_int"].extend(
                        int(d) if leg == "exact" else 0 for d in key[order]
                    )
                    rows["d_f"].extend(
                        float(d) if leg == "adc" else 0.0 for d in key[order]
                    )
            yield pd.DataFrame(rows)

    local = vq.mapInPandas(
        kernel, schema="qid BIGINT, vid BIGINT, leg STRING, d_int BIGINT, d_f DOUBLE"
    )
    # Global top-k per (leg, qid): the window input is already pruned to
    # O(batches x queries x k) rows, and each partition is one (leg, qid)
    # slice of that bounded set. Ordering by (d_int, d_f, vid) is correct
    # for BOTH legs: the inactive distance column is a constant 0.
    w = W.partitionBy("leg", "qid").orderBy("d_int", "d_f", "vid")
    top = (
        local.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= topk)
        .select("qid", "vid", "leg")
    )
    exact = top.filter(F.col("leg") == "exact").select("qid", "vid")
    adc = top.filter(F.col("leg") == "adc").select("qid", "vid")
    hits = exact.join(adc, ["qid", "vid"]).groupBy("qid").agg(
        F.count(F.lit(1)).alias("n_overlap")
    )
    base = exact.groupBy("qid").agg(F.count(F.lit(1)).alias("n_exact"))
    return (
        base.join(hits, "qid", "left")
        .select(
            F.col("qid").alias("query_vid"),
            F.coalesce(F.col("n_overlap"), F.lit(0)).cast("int").alias("n_overlap"),
            (F.coalesce(F.col("n_overlap"), F.lit(0)) * 1.0 / F.col("n_exact")).alias(
                "recall_at_k"
            ),
        )
        .orderBy("query_vid")
    )
