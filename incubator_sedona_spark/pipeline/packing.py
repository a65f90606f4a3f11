"""Training-data shard construction: deterministic splits, stratified
sampling, and token-budget sequence packing.

These are the operations a 100-TB training-data pipeline runs after
dedup/quality filtering: carve the corpus into train/val/test with a
content-stable rule, downsample strata to target mixture rates, and pack
documents into fixed-token-budget shards for the trainer.

Engine-portability contract: the bucketing hash is ``md5`` over the string
form of the id — byte-identical in Spark, DuckDB, Postgres, and Python's
``hashlib`` — so a split computed here can be reproduced (and audited) by
any other system that can hash a string.  That matters operationally: the
train/test boundary must never silently move when the pipeline is re-run
elsewhere, or test-set contamination follows.

Scale notes (the 100-TB lens):
- ``hash_bucket_col`` / ``deterministic_split`` / ``stratified_sample`` are
  row-local expressions — zero shuffle, whole-stage codegen, applied at the
  scan.  A split of a 100-TB corpus is one map pass.
- ``pack_shards`` / ``pack_shards_nextfit`` shuffle ONCE (hash partition by
  bucket + sort by the order column inside each bucket).  Packing is
  inherently sequential *within* a shard stream, so the parallel unit is the
  bucket: ``n_buckets`` bounds parallelism and memory (one bucket's rows sort
  together).  Choose ``n_buckets`` >= cluster cores; buckets are md5-uniform
  so there is no planted skew to salt.
"""

from __future__ import annotations

from typing import Iterable, Mapping

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "hash_bucket_col",
    "deterministic_split",
    "stratified_sample",
    "pack_shards",
    "pack_shards_nextfit",
    "epoch_key_col",
    "epoch_head",
]

# 4 hex chars = 16 bits: 65536 raw values, enough resolution for per-10k
# bucket rates while staying exactly representable in every engine's INT
_HEX_CHARS = 4
_RAW_SPACE = 1 << (4 * _HEX_CHARS)


def hash_bucket_col(id_col: Column, n_buckets: int = 100) -> Column:
    """Deterministic bucket in [0, n_buckets) from md5 of the id's string form.

    Cross-engine oracle (DuckDB/Postgres):
    ``('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 4))::INT % n``.
    """
    if not 1 <= n_buckets <= _RAW_SPACE:
        raise ValueError(f"n_buckets must be in [1, {_RAW_SPACE}], got {n_buckets}")
    raw = F.conv(F.substring(F.md5(id_col.cast("string")), 1, _HEX_CHARS), 16, 10)
    return (raw.cast("int") % n_buckets).alias("bucket")


def deterministic_split(
    df: DataFrame,
    id_col: str,
    weights: Mapping[str, int] | None = None,
    split_col: str = "split",
) -> DataFrame:
    """Assign every row a content-stable split label.

    ``weights`` maps label -> integer weight out of 100 (default
    ``{"train": 98, "val": 1, "test": 1}``).  A row's label depends only on
    its id, so re-running over a grown corpus never moves an old row across
    the boundary (the property random ``df.randomSplit`` lacks).
    """
    if weights is None:
        weights = {"train": 98, "val": 1, "test": 1}
    if any(w < 0 for w in weights.values()) or sum(weights.values()) != 100:
        raise ValueError(f"split weights must be >= 0 and sum to 100: {dict(weights)}")
    bucket = hash_bucket_col(F.col(id_col), 100)
    expr = None
    lo = 0
    for label, w in weights.items():
        cond = (bucket >= lo) & (bucket < lo + w)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
        lo += w
    return df.withColumn(split_col, expr)


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: Mapping[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum downsampling (data-mixture control).

    ``rates`` maps stratum value -> keep fraction in [0, 1], resolved at
    1/10000 granularity; strata absent from ``rates`` keep ``default_rate``.
    Row-local and reproducible — unlike ``df.sampleBy`` the kept set is a
    pure function of (id, stratum), so two pipeline runs agree row-for-row.
    """

    def _thresh(r: float) -> int:
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate must be in [0,1], got {r}")
        return int(round(r * _RAW_SPACE))

    raw = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, _HEX_CHARS), 16, 10
    ).cast("int")
    thresh = F.lit(_thresh(default_rate))
    for value, rate in rates.items():
        thresh = F.when(F.col(strata_col) == value, _thresh(rate)).otherwise(thresh)
    return df.where(raw < thresh)


def pack_shards(
    df: DataFrame,
    token_col: str,
    order_col: str,
    budget: int,
    id_col: str | None = None,
    n_buckets: int = 64,
    bucket_col: str = "bucket",
    shard_col: str = "shard",
) -> DataFrame:
    """Pack documents into token-budget shards — start-offset rule (native).

    Within each bucket, documents are laid end-to-end in ``order_col`` order;
    a document belongs to the shard its FIRST token falls in:
    ``shard = floor((cumsum_tokens - tokens) / budget)``.  Document
    boundaries are respected and a shard overflows by at most one document —
    the semantics of trainer shard manifests where the reader streams
    documents until the budget is crossed.  Pure window cumsum: exactly one
    shuffle (by bucket), no UDF, SQL-oracle-able.

    ``id_col`` (defaults to ``order_col``) feeds the bucket hash.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    out = df.withColumn(bucket_col, hash_bucket_col(F.col(id_col or order_col), n_buckets))
    w = (
        Window.partitionBy(bucket_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum(token_col).over(w) - F.col(token_col)
    return out.withColumn(shard_col, F.floor(start / F.lit(budget)))


def pack_shards_nextfit(
    df: DataFrame,
    token_col: str,
    order_col: str,
    budget: int,
    id_col: str | None = None,
    n_buckets: int = 64,
    bucket_col: str = "bucket",
    shard_col: str = "shard",
) -> DataFrame:
    """Pack documents into token-budget shards — exact next-fit (never
    overflow a shard, except by a single document that alone exceeds the
    budget).

    The greedy reset (``running + t > budget -> new shard``) is a stateful
    scan, not a window function, so each bucket is packed in one
    ``applyInPandas`` group: one shuffle by bucket, then a linear numpy pass
    per bucket.  Parallelism = ``n_buckets``; a bucket's rows must fit one
    task (at 100 TB pick n_buckets so a bucket is a few GB — md5-uniform, so
    sizing is corpus_size / n_buckets, no skew term).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    out = df.withColumn(bucket_col, hash_bucket_col(F.col(id_col or order_col), n_buckets))
    # copy the fields: StructType.add mutates in place, and df.schema is the
    # DataFrame's cached schema object — mutating it corrupts the plan
    from pyspark.sql.types import LongType, StructField, StructType

    schema_out = StructType(list(out.schema.fields) + [StructField(shard_col, LongType())])
    order_name, token_name = order_col, token_col

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_name, kind="mergesort").reset_index(drop=True)
        tokens = pdf[token_name].to_numpy(np.float64)
        shard = np.empty(len(tokens), dtype=np.int64)
        s, running = 0, 0.0
        for i, t in enumerate(tokens):
            if running > 0.0 and running + t > budget:
                s, running = s + 1, 0.0
            shard[i] = s
            running += t
        pdf[shard_col] = shard
        return pdf

    return out.groupBy(bucket_col).applyInPandas(_pack, schema=schema_out)


def epoch_key_col(id_col: Column, epoch: int) -> Column:
    """Deterministic per-epoch shuffle key: ``md5(id || ':' || epoch)``.

    Trainers want a DIFFERENT data order every epoch but the SAME order on
    every re-run/resume of a given epoch; a seeded RNG over a distributed
    scan cannot give that (partition order is not stable), a content hash
    can.  Sort (or range-partition) by this key to realize the epoch's
    order — e.g. ``write_tar_shards(df.withColumn("ek", epoch_key_col(...)),
    ..., order_by="ek")`` lays shards out in epoch order.

    Cross-engine oracle: ``md5(CAST(id AS VARCHAR) || ':' || epoch)`` —
    byte-identical in DuckDB/Postgres/Python hashlib.
    """
    if epoch < 0:
        raise ValueError(f"epoch must be >= 0, got {epoch}")
    return F.md5(F.concat(id_col.cast("string"), F.lit(f":{epoch}")))


def epoch_head(
    df: DataFrame, epoch: int, k: int, id_col: str = "doc_id"
) -> DataFrame:
    """First ``k`` rows of the epoch's deterministic order (id, epoch_key).

    TakeOrderedAndProject — partial top-k per partition, no global sort;
    the audit/oracle view of ``epoch_key_col`` (the full epoch order is
    realized by sorting on the key, which a trainer does shard-locally).
    """
    ek = epoch_key_col(F.col(id_col), epoch)
    return (
        df.select(F.col(id_col), ek.alias("epoch_key"))
        .orderBy("epoch_key", id_col)
        .limit(k)
    )
