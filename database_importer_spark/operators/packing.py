"""Sequence packing — group variable-length documents into
fixed-token-budget bins (LLM pretraining "sample packing").

Packing is inherently sequential, so it can't be one global
expression; the scale shape is: deterministically bucket documents
(hash of id), then run first-fit-decreasing *within each bucket* as
one Arrow batch (applyInPandas). Buckets pack independently on
executors — the classic embarrassingly-parallel compromise: slightly
worse fill than a single global pack, linear scale-out, fully
deterministic output.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OUT_SCHEMA = "doc_id bigint, bin_id bigint, bin_fill bigint"


def pack_sequences(
    df: DataFrame,
    id_col: str,
    size_col: str,
    max_tokens: int,
    num_buckets: int = 8,
    bucket_col: str | None = None,
) -> DataFrame:
    """Assign each document to a bin of capacity ``max_tokens``.

    First-fit-decreasing within deterministic hash buckets; bin ids
    are globally unique (bucket * 2^40 + local index). Oversized docs
    (> max_tokens) get a bin of their own rather than failing — the
    caller decides whether to truncate upstream.

    ``bucket_col``: use an existing column as the bucket id instead
    of the default xxhash64(id) % num_buckets — pass a portable hash
    (e.g. the repo's multiplicative-hash convention) when the result
    must be reproducible outside Spark (exact-oracle checking).
    """

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        bucket = int(pdf["__bucket"].iloc[0])
        # deterministic order: size desc, id asc
        pdf = pdf.sort_values([size_col, id_col], ascending=[False, True])
        bins: list[int] = []  # remaining capacity per local bin
        assign: list[int] = []
        for size in pdf[size_col]:
            placed = None
            for i, rem in enumerate(bins):
                if rem >= size:
                    placed = i
                    bins[i] = rem - size
                    break
            if placed is None:
                bins.append(max(max_tokens - size, 0))
                placed = len(bins) - 1
            assign.append(placed)
        out = pd.DataFrame(
            {
                "doc_id": pdf[id_col].values,
                "bin_id": [bucket * (1 << 40) + a for a in assign],
            }
        )
        fills = out.join(
            pdf[[size_col]].reset_index(drop=True)
        ).groupby("bin_id")[size_col].transform("sum")
        out["bin_fill"] = fills.astype("int64")
        return out

    bucket = (
        F.col(bucket_col)
        if bucket_col
        else F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_buckets))
    )
    bucketed = df.select(
        F.col(id_col), F.col(size_col), bucket.alias("__bucket")
    )
    return bucketed.groupBy("__bucket").applyInPandas(pack, OUT_SCHEMA)
