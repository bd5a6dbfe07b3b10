"""Sequence packing for training-shard assembly (SURVEY §2.12 [EXT],
north-star surface — no reference counterpart).

Packs documents into fixed token-budget training sequences: within each
group (e.g. source), documents are visited in a deterministic order and
assigned greedily to the current pack until the next document would exceed
the budget, which opens a new pack. Documents longer than the budget get a
pack of their own (they would be split by the chunker first in a real run —
see queries/curation.doc_chunk_packing).

The assignment is a stateful scan (a running sum that RESETS on overflow),
which no SQL window expresses — this is exactly the grouped-map
`applyInPandas` niche (§2.11): one shuffle on the group key, then a pure
pandas kernel per group, Arrow-batched both ways.

Scale: groups are independent (embarrassingly parallel); a group's rows must
fit in one executor's memory — for corpus curation the group key is chosen
accordingly (source/shard, not the whole corpus). Skewed groups would use a
pre-split salt on the group key at constant pack-count cost.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

def _packed_schema(docs: DataFrame, id_col: str, group_col: str) -> StructType:
    """Output schema built from the INPUT's actual id/group column types —
    a string doc id or an int group key must round-trip through Arrow
    unchanged, not be miscast to a hardcoded BIGINT/STRING."""
    in_schema = {f.name: f.dataType for f in docs.schema.fields}
    return StructType(
        [
            StructField("doc_id", in_schema[id_col]),
            StructField("group_key", in_schema[group_col]),
            StructField("n_tokens", LongType()),
            StructField("pack_id", LongType()),
            StructField("pack_pos", LongType()),
        ]
    )


def pack_sequences(
    docs: DataFrame,
    budget: int = 2048,
    group_col: str = "source",
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    order_col: str | None = None,
) -> DataFrame:
    """Greedy sequential packing of documents into ``budget``-token packs.

    Returns (doc_id, group_key, n_tokens, pack_id, pack_pos): pack_id
    numbers packs within a group from 0 in visit order, pack_pos is the
    document's position inside its pack. Deterministic: visit order is
    (order_col or id_col) ascending, so reruns and backfills produce
    identical shards.
    """
    order = order_col or id_col

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort").reset_index(drop=True)
        pack_ids, positions = [], []
        cur_pack, cur_tokens, cur_pos = 0, 0, 0
        for n in pdf["_n"]:
            n = int(n)
            if cur_tokens > 0 and cur_tokens + n > budget:
                cur_pack += 1
                cur_tokens, cur_pos = 0, 0
            pack_ids.append(cur_pack)
            positions.append(cur_pos)
            cur_tokens += n
            cur_pos += 1
        return pd.DataFrame(
            {
                "doc_id": pdf[id_col],
                "group_key": pdf[group_col],
                "n_tokens": pdf["_n"],
                "pack_id": pack_ids,
                "pack_pos": positions,
            }
        )

    cols = [F.col(id_col), F.col(group_col), F.col(tokens_col).cast("bigint").alias("_n")]
    if order not in (id_col, group_col):
        cols.append(F.col(order))
    prepared = docs.select(*cols)
    schema = _packed_schema(docs, id_col, group_col)
    return prepared.groupBy(group_col).applyInPandas(pack, schema=schema)
