"""Sinks (SURVEY §2.1 S5-S7, S10).

The reference writes every intermediate to single CSV files plus a GEXF
graph and a text report (pipeline2.py:333-1146). Engine-native sinks are
partitioned parquet/CSV directories; single-file and GEXF forms exist for
reference parity and are explicitly driver-side (documented as such — at
100 TB you write partitioned parquet, full stop)."""

from __future__ import annotations

from xml.sax.saxutils import escape

from pyspark.sql import DataFrame


def write_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """CSV sink with header (S5). ``single_file=True`` coalesces to one
    partition for reference parity — driver-scale outputs only (the
    reference's CSVs are all post-aggregation tables)."""
    out = df.coalesce(1) if single_file else df
    out.write.option("header", True).mode("overwrite").csv(path)


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    bucket_by: tuple[int, list[str]] | None = None,
    table_name: str | None = None,
) -> None:
    """Engine-native sink: partitioned (and optionally bucketed) parquet.
    Partition columns give free partition pruning on read; bucketing
    pre-shuffles join/agg keys so downstream equi-joins on the bucket key
    skip their exchange (the 100 TB co-location tool)."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    if bucket_by:
        n, cols = bucket_by
        if not table_name:
            raise ValueError("bucketBy requires saveAsTable (give table_name)")
        w.bucketBy(n, *cols).sortBy(*cols).option("path", path).format(
            "parquet"
        ).saveAsTable(table_name)
        return
    w.parquet(path)


def write_gexf(nodes: DataFrame, edges: DataFrame, path: str) -> None:
    """GEXF graph emitter (S7 parity, nx.write_gexf at pipeline2.py:719).
    Driver-side by design: GEXF is a single-document XML format; use it for
    post-top-K graphs only (the engine's native graph sink is the two-table
    parquet form)."""
    node_rows = nodes.select("node").collect()
    edge_rows = edges.collect()
    ecols = set(edges.columns)
    with open(path, "w") as f:
        f.write('<?xml version="1.0" encoding="UTF-8"?>\n')
        f.write('<gexf xmlns="http://gexf.net/1.3" version="1.3">\n')
        f.write('  <graph defaultedgetype="undirected">\n    <nodes>\n')
        for r in node_rows:
            nid = escape(str(r["node"]))
            f.write(f'      <node id="{nid}" label="{nid}" />\n')
        f.write("    </nodes>\n    <edges>\n")
        for i, r in enumerate(edge_rows):
            w = f' weight="{r["weight"]}"' if "weight" in ecols else ""
            f.write(
                f'      <edge id="{i}" source="{escape(str(r["src"]))}"'
                f' target="{escape(str(r["dst"]))}"{w} />\n'
            )
        f.write("    </edges>\n  </graph>\n</gexf>\n")


def write_summary_report(sections: dict[str, object], path: str) -> None:
    """Text report sink (S10, pipeline2.py:1118-1146): plain key/value +
    table sections. Driver-side formatting of already-aggregated values."""
    with open(path, "w") as f:
        for title, body in sections.items():
            f.write(f"== {title} ==\n")
            if isinstance(body, DataFrame):
                rows = body.collect()
                cols = body.columns
                f.write("\t".join(cols) + "\n")
                for r in rows:
                    f.write("\t".join(str(r[c]) for c in cols) + "\n")
            elif isinstance(body, dict):
                for k, v in body.items():
                    f.write(f"{k}: {v}\n")
            else:
                f.write(str(body) + "\n")
            f.write("\n")


def write_jsonl(df: DataFrame, path: str, single_file: bool = False) -> None:
    """JSON-lines sink — the LLM-corpus interchange format (one JSON object
    per line, gzip-splittable when uncompressed). Partitioned directory by
    default; ``single_file=True`` coalesces for driver-scale outputs."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").json(path)


def read_jsonl(spark, path: str, schema=None) -> DataFrame:
    """JSON-lines source. Pass an explicit schema at scale: schema-less
    reads trigger a full inference pass over the data (twice the IO), and
    inferred types drift between shards — the canonical JSONL ingestion
    mistake."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)
