"""Round-6 verdict asks, "Done"-criteria tests: the --drift and
--assemble CLI legs (VERDICT r5 asks #3, #8 — the dataset-assembly
operators and PSI drift must be user-reachable, not library-only),
and the bloom banded-segment build's collect-volume bound (ask #2 —
the round-5 weak finding was a dense per-partition bitmap OR'd on
the driver, O(partitions x m_bits) collect volume)."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F


def _run_cli(fix: str, out: str, extra: list[str]) -> None:
    from ves_spark import __main__ as cli

    cli.main([
        "--sequences", f"{fix}/sequences.parquet",
        "--source-meta", f"{fix}/source_meta.parquet",
        "--route-rules", f"{fix}/route_rules.parquet",
        "--out", out, "--units", "2", "--units-per-increment", "2",
        *extra,
    ])


# =====================================================================
# --drift CLI leg (ask #8)
# =====================================================================


def test_cli_drift_first_epoch_skips(spark, tmp_path):
    """With only one ingest batch there is no baseline epoch: --drift
    must skip loudly (stats line) and write NO drift table — an empty
    table would read as 'no drift' which is a different claim."""
    from ves_spark.synth import write_fixture

    fix = str(tmp_path / "fix")
    write_fixture(fix, 4_000, seed=61, sequences_as_dir=True)
    out = str(tmp_path / "out")
    _run_cli(fix, out, ["--drift"])
    assert not os.path.exists(f"{out}/drift")


def test_cli_drift_second_epoch_writes_table(spark, tmp_path):
    """Two epochs (a new file appearing between runs -> a second
    ingest batch): --drift scores the newest batch's routed
    distribution against all prior batches' and lands per-feature
    psi + flagged at <out>/drift."""
    from ves_spark.synth import append_sequences, write_fixture

    fix = str(tmp_path / "fix")
    write_fixture(fix, 4_000, seed=62, sequences_as_dir=True)
    out = str(tmp_path / "out")
    _run_cli(fix, out, ["--drift"])
    append_sequences(fix, 3_000, seed=63, start_row=4_000)
    _run_cli(fix, out, ["--drift"])

    drift = spark.read.parquet(f"{out}/drift")
    assert set(drift.columns) == {"feature", "psi", "flagged"}
    rows = {r["feature"]: r for r in drift.collect()}
    assert set(rows) == {"n_tok", "source", "sink"}
    for r in rows.values():
        assert np.isfinite(r["psi"]) and r["psi"] >= 0.0
        assert r["flagged"] == (r["psi"] >= 0.25)
    # same generator, same distribution: nothing should flag
    assert not any(r["flagged"] for r in rows.values())


# =====================================================================
# --assemble CLI leg (ask #3)
# =====================================================================


def test_cli_assemble_writes_disjoint_splits(spark, tmp_path):
    """--assemble lands <out>/assembly hive-partitioned by _split
    (ONE corpus scan + ONE shuffle for all three splits): every
    routed doc in exactly one split (doc-hash split — no doc leaks
    across splits regardless of sink fan-out), deterministic shuffle
    order and chunk assignments present."""
    import os

    from ves_spark.synth import write_fixture

    fix = str(tmp_path / "fix")
    write_fixture(fix, 6_000, seed=64)
    out = str(tmp_path / "out")
    _run_cli(fix, out, [
        "--assemble", "--assemble-val-pct", "10", "--assemble-test-pct", "10",
    ])

    asm = spark.read.parquet(f"{out}/assembly")
    assert {"_split=train", "_split=val", "_split=test"} <= set(
        os.listdir(f"{out}/assembly")
    )
    splits = {
        name: asm.filter(F.col("_split") == name).drop("_split")
        for name in ("train", "val", "test")
    }
    for df in splits.values():
        assert {"doc_id", "n_tok", "shuffle_order", "shard"} <= set(df.columns)
    ids = {
        name: {r[0] for r in df.select("doc_id").distinct().collect()}
        for name, df in splits.items()
    }
    assert ids["train"] and ids["val"] and ids["test"]
    assert not (ids["train"] & ids["val"])
    assert not (ids["train"] & ids["test"])
    assert not (ids["val"] & ids["test"])

    routed = spark.read.parquet(f"{out}/routed")
    routed_ids = {r[0] for r in routed.select("doc_id").distinct().collect()}
    assert ids["train"] | ids["val"] | ids["test"] == routed_ids

    # routing fans a doc to 0..k sinks; assembly must carry each doc ONCE
    total = sum(df.count() for df in splits.values())
    assert total == len(routed_ids)


def test_cli_assemble_ffd_bins_within_capacity(spark, tmp_path):
    """--assemble-pack ffd: whole-doc bins, every (split, shard, bin)
    within capacity, bin ids dense from 0 per stream."""
    from ves_spark.synth import write_fixture

    fix = str(tmp_path / "fix")
    write_fixture(fix, 4_000, seed=65)
    out = str(tmp_path / "out")
    cap = 2048
    _run_cli(fix, out, [
        "--assemble", "--assemble-pack", "ffd",
        "--assemble-capacity", str(cap),
        "--assemble-val-pct", "10", "--assemble-test-pct", "10",
    ])
    train = spark.read.parquet(f"{out}/assembly").filter("_split = 'train'")
    assert "bin_id" in train.columns
    fills = train.groupBy("shard", "bin_id").agg(
        F.sum("n_tok").alias("fill"), F.min("bin_id").alias("b")
    )
    assert fills.filter(F.col("fill") > cap).count() == 0
    assert train.agg(F.min("bin_id")).first()[0] == 0


def test_cli_assemble_is_deterministic(spark, tmp_path):
    """Same fixture + same seed run in two separate out dirs -> byte-
    identical (doc_id, shuffle_order, shard) assignments: the
    assembly is replayable, the property the deterministic shuffle
    and hash split exist for."""
    from ves_spark.synth import write_fixture

    fix = str(tmp_path / "fix")
    write_fixture(fix, 3_000, seed=66)
    outs = []
    for name in ("o1", "o2"):
        out = str(tmp_path / name)
        _run_cli(fix, out, ["--assemble", "--assemble-seed", "7"])
        outs.append(
            sorted(
                spark.read.parquet(f"{out}/assembly")
                .filter("_split = 'train'")
                .select("doc_id", "shuffle_order", "shard")
                .collect()
            )
        )
    assert outs[0] == outs[1]


# =====================================================================
# Bloom banded-segment build (ask #2)
# =====================================================================


def test_bloom_segment_rows_bounded_by_bands_not_partitions(spark):
    """Collect volume is O(m_bits/band_bits) segment rows no matter
    how many input partitions build the filter — the round-5 weak
    finding was O(partitions) dense bitmaps. Same keys at 2 and 32
    partitions must produce the same segments and an identical
    assembled bitmap."""
    from ves_spark.operators.bloom import bloom_segments, build_bloom_bitmap

    m_bits, k, band_bits = 1 << 18, 5, 1 << 16  # 4 bands max
    base = spark.range(0, 4_000).select(
        F.xxhash64(F.col("id").cast("string")).alias("h")
    )
    seg_counts, bitmaps = [], []
    for parts in (2, 32):
        df = base.repartition(parts)
        segs = bloom_segments(df, m_bits, k, band_bits=band_bits)
        seg_counts.append(segs.count())
        bitmaps.append(build_bloom_bitmap(df, m_bits, k, band_bits=band_bits))
    max_bands = m_bits // band_bits
    assert seg_counts[0] == seg_counts[1] <= max_bands
    assert np.array_equal(bitmaps[0], bitmaps[1])


def test_bloom_segments_sized_to_band_not_filter(spark):
    """Each emitted segment is band-sized (band_bits/8 bytes), not
    filter-sized: no task and no single collected row ever holds the
    whole bitmap."""
    from ves_spark.operators.bloom import bloom_segments

    m_bits, k, band_bits = 1 << 18, 5, 1 << 16
    df = spark.range(0, 1_000).select(
        F.xxhash64(F.col("id").cast("string")).alias("h")
    )
    rows = bloom_segments(df, m_bits, k, band_bits=band_bits).collect()
    assert rows
    for r in rows:
        assert len(r["seg"]) == band_bits // 8
        assert 0 <= r["band"] < m_bits // band_bits


def test_bloom_build_rejects_unaligned_m_bits(spark):
    from ves_spark.operators.bloom import bloom_segments

    df = spark.range(0, 10).select(F.xxhash64("id").alias("h"))
    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_segments(df, 100, 3)


# =====================================================================
# Spark-side discovery state (ask #5): driver materialization bound
# =====================================================================


def test_steady_state_discovery_collects_o_batches_not_o_files(
    spark, tmp_path, monkeypatch
):
    """A fully-committed store with many (batch, file) claims: a
    steady-state rescan must collect O(batches) rows on the driver —
    zero delta rows from discovery_delta and one count row per batch
    from pending_work — never the per-file map (the round-5 driver-
    memory finding). Asserted by counting every row any .collect()
    during discovery actually returns."""
    from pyspark.sql import DataFrame

    from ves_spark.checkpoint import LineageStore

    n_batches, files_per_batch, n_units = 12, 400, 4
    store = LineageStore(str(tmp_path / "lineage"))
    current = {}
    for seq in range(n_batches):
        files = [f"/in/b{seq:02d}/f-{i:04d}.parquet" for i in range(files_per_batch)]
        fps = {p: f"100:aa:bb:10" for p in files}
        current.update(fps)
        store.record_ingest(seq, files, "run-x", fingerprints=fps)
        store.append(
            [
                {
                    "run_id": "run-x",
                    "stage": "route",
                    "batch_seq": seq,
                    "unit_id": u,
                    "source": None,
                    "rows": 1,
                    "bytes": 4,
                    "snapshot_id": 1,
                }
                for u in range(n_units)
            ]
        )

    collected: list[int] = []
    orig = DataFrame.collect

    def spy(self):
        rows = orig(self)
        collected.append(len(rows))
        return rows

    monkeypatch.setattr(DataFrame, "collect", spy)

    delta = store.discovery_delta(spark, current)
    assert delta["new"] == [] and delta["changed"] == [] and delta["missing"] == []
    assert delta["max_seq"] == n_batches - 1
    assert sum(collected) == 0, "steady-state delta must collect zero rows"

    collected.clear()
    assert store.pending_work(spark, n_units) == []
    # one incomplete-batch probe row per batch at most, never per file
    assert sum(collected) <= n_batches
