"""Z-order (Morton-curve) clustering: multi-dimensional file skipping.

``sizing.py``'s 1-D range clustering makes files disjoint on ONE
column — a predicate on any other column still touches every file.
Z-ordering interleaves the bits of several columns' equi-depth bucket
ranks and range-partitions on the interleaved value, so every output
file covers a small HYPER-RECTANGLE of the key space: parquet footer
min/max stats then prune files for predicates on ANY clustered
column, not just the first. This is Iceberg's
``rewrite_data_files(strategy => 'sort', sort_order => zorder(...))``
re-expressed as plain DataFrame ops.

Scale shape: bucket boundaries come from one ``approxQuantile`` pass
(driver state = (2^bits - 1) doubles per dimension — metadata-sized);
bucketing + bit interleaving are pure JVM bit arithmetic inside
codegen (no UDF); placement is ONE ``repartitionByRange`` exchange on
the z-value, identical cost to the 1-D clustered write. Equi-depth
(not equi-width) ranks make the curve robust to skew: each bucket
holds ~1/2^bits of the data no matter how the values are distributed.

Reference basis: sink-side layout is the half of the reference's sink
stage it never implements (reads are sized, `src/tailer/reader.rs:10`;
writes don't exist) — same gap `sizing.py` fills, one dimension up.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def equi_depth_bounds(df: DataFrame, col: str, bits: int) -> list[float]:
    """The (2^bits - 1) approximate quantile boundaries splitting
    ``col`` into 2^bits equal-mass buckets."""
    n = 1 << bits
    qs = [i / n for i in range(1, n)]
    return df.approxQuantile(col, qs, 0.001)


def bucket_of(col: str, bounds: list[float]) -> Column:
    """Rank of ``col`` among literal ``bounds``: the number of
    boundaries <= the value — a JVM higher-order fold over a literal
    array, monotone in the value, 0..len(bounds)."""
    arr = F.array(*[F.lit(float(b)) for b in bounds])
    return F.aggregate(
        arr,
        F.lit(0),
        lambda acc, b: acc
        + F.when(F.col(col).cast("double") >= b, 1).otherwise(0),
    )


def interleave_bits(bucket_cols: list[Column], bits: int) -> Column:
    """Morton code of k bucket ranks: bit j of dimension d lands at
    output position j*k + d. Generic in k (unlike the stride-2
    magic-number spread), still pure shift/and/or arithmetic inside
    whole-stage codegen — bits*k terms, each one and+shift."""
    k = len(bucket_cols)
    terms = []
    for d, c in enumerate(bucket_cols):
        x = c.cast("long")
        for j in range(bits):
            terms.append(
                F.shiftleft(
                    F.shiftright(x, j).bitwiseAND(F.lit(1)), j * k + d
                )
            )
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out


def zorder_value(
    df: DataFrame, cols: list[str], bits: int = 8, bounds: dict | None = None
) -> tuple[Column, dict]:
    """(z-value column expression, per-col boundaries). Pass
    ``bounds`` to reuse boundaries across writes (stable layout for
    compaction re-runs)."""
    if len(cols) < 2:
        raise ValueError("z-ordering needs >= 2 columns; use sizing.py's range clustering for one")
    if bits < 1 or bits * len(cols) > 62:
        raise ValueError(f"bits*len(cols) must stay within a long, got {bits}x{len(cols)}")
    bounds = dict(bounds) if bounds else {}
    for c in cols:
        if c not in bounds:
            bounds[c] = equi_depth_bounds(df, c, bits)
    zval = interleave_bits([bucket_of(c, bounds[c]) for c in cols], bits)
    return zval, bounds


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    target_file_bytes: int = 128 << 20,
    n_rows: int | None = None,
    row_bytes: float | None = None,
    mode: str = "overwrite",
) -> dict:
    """Target-size parquet write clustered on the Morton curve of
    ``cols``: one quantile pass, one range exchange on the z-value,
    in-partition sort by it, then the synthetic column is dropped —
    files carry only real data, their footer stats carry the
    rectangles."""
    from ves_spark.sources.sizing import estimate_row_bytes

    n = df.count() if n_rows is None else int(n_rows)
    if n == 0:
        df.coalesce(1).write.mode(mode).parquet(path)
        return {"n_files": 1, "rows_per_file": 0, "bounds": {}}
    zval, bounds = zorder_value(df, cols, bits)
    bpr = estimate_row_bytes(df) if row_bytes is None else float(row_bytes)
    rows_per_file = max(1, int(target_file_bytes / max(bpr, 1e-9)))
    n_files = max(1, math.ceil(n / rows_per_file))
    (
        df.withColumn("__zval", zval)
        .repartitionByRange(n_files, F.col("__zval"))
        .sortWithinPartitions("__zval")
        .drop("__zval")
        .write.mode(mode)
        .option("maxRecordsPerFile", rows_per_file)
        .parquet(path)
    )
    return {
        "n_files": n_files,
        "rows_per_file": rows_per_file,
        "bounds": bounds,
    }
