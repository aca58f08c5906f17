"""Scale-adaptive parallelism floor for compute-heavy operators.

Two distinct bottlenecks motivate this helper (round-7 measurement,
OPTIMIZATION_r07.md):

* **File-limited scans.** A parquet file is only splittable at row-group
  boundaries; a byte-small single-row-group table (every testdata table
  here) pins the whole scan — and every map-side expression fused into
  it — to ONE task regardless of split config. A keyed, deterministic
  repartition right after the read unlocks the cores for
  compute-per-row-heavy operators at the cost of one narrow shuffle of
  the operator's projected input.
* **AQE byte-based coalescing under compute fan-out.** AQE sizes
  post-shuffle partitions by BYTES; a self-join whose probe reads a few
  MB but fans out 10^7..10^8 pairs gets coalesced onto one task. An
  explicit ``repartition(n, keys)`` (REPARTITION_BY_NUM) is never
  coalesced, and when ``keys`` are the join/grouping keys the join
  reuses the exchange — so at real scale this costs nothing extra: it
  is the join's own shuffle, pinned to a sane partition count.

``spread`` is probe-gated by default (no-op when the input already has
enough partitions — i.e. at real scale with well-split inputs);
``force=True`` is for pre-join sites where the static partition count
lies about runtime parallelism (AQE coalescing) and the exchange is
needed anyway. Partition count follows the session's parallelism —
never a constant tuned to one machine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(
    df: DataFrame, *key_cols: str, force: bool = False, factor: int = 1
) -> DataFrame:
    """Hash-repartition ``df`` on ``key_cols`` to the session's default
    parallelism when its current partitioning would under-parallelize
    downstream compute. Deterministic (keyed — no round-robin, no
    rand()), AQE-coalesce-proof (explicit numPartitions). ``factor``
    over-partitions relative to the core count for stages whose
    per-partition state (e.g. a pair-count hash map) must stay small
    enough not to spill."""
    if not key_cols:
        raise ValueError("spread() needs at least one key column "
                         "(round-robin repartition is not reshard-safe)")
    p = df.sparkSession.sparkContext.defaultParallelism * max(int(factor), 1)
    if not force:
        try:
            if df.rdd.getNumPartitions() >= p:
                return df
        except Exception:
            pass  # un-probeable plan: fall through to the repartition
    return df.repartition(p, *key_cols)
