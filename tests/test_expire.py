"""Snapshot expiration + orphan-file sweep on the Iceberg contract
double (snapshot_catalog.py): overwrite/retire churn strands immutable
data dirs; expire_snapshots must reclaim exactly the unreferenced ones
while current-state reads stay bit-identical, incremental reads across
the expired fence refuse loudly, and the commit-then-clean order makes
a crash between the two recoverable."""

import os

import pytest

from ves_spark.sources.snapshot_catalog import LocalSnapshotCatalog


@pytest.fixture()
def cat(tmp_path):
    return LocalSnapshotCatalog(str(tmp_path))


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, v int, part int")


def _dirs(cat, name):
    return set(os.listdir(os.path.join(cat._tdir(name), "data")))


def _churn(spark, cat):
    """5 snapshots: two appends, two overwrites of part=0, one delete
    of part=1 — leaves two fully-unreferenced data dirs."""
    cat.append(_df(spark, [("a", 1, 0), ("b", 2, 1)]), "t", ["part"])  # s1
    cat.append(_df(spark, [("c", 3, 2)]), "t", ["part"])               # s2
    cat.overwrite_partitions(_df(spark, [("a2", 9, 0)]), "t", ["part"])  # s3
    cat.overwrite_partitions(_df(spark, [("a3", 10, 0)]), "t", ["part"])  # s4
    cat.delete_partitions("t", [{"part": 1}])                           # s5


def test_expire_reclaims_only_unreferenced_dirs(spark, cat):
    _churn(spark, cat)
    before_rows = {
        (r["k"], r["v"], r["part"]) for r in cat.read(spark, "t").collect()
    }
    before_dirs = _dirs(cat, "t")
    assert len(before_dirs) == 4  # s1, s2, s3, s4 wrote data (s5 didn't)

    stats = cat.expire_snapshots("t", keep_last=1, orphan_age_s=0.0)

    # s3's dir (overwritten by s4) is unreferenced; s1's dir is STILL
    # live via part=1? no — part=1 was deleted, but s1 also has no
    # other live spec, so s1's dir goes too. s2 (part=2 live) and s4
    # (part=0 live) survive even though their history entries expired.
    after_dirs = _dirs(cat, "t")
    assert len(after_dirs) == 2
    assert stats["expired_snapshots"] == 4  # kept only s5's entry
    assert len(stats["removed_dirs"]) == 2

    # current state is bit-identical, snapshot id untouched
    after_rows = {
        (r["k"], r["v"], r["part"]) for r in cat.read(spark, "t").collect()
    }
    assert after_rows == before_rows == {("a3", 10, 0), ("c", 3, 2)}
    assert cat.current_snapshot_id("t") == 5


def test_incremental_read_across_expired_fence_raises(spark, cat):
    for i in range(4):  # s1..s4, append-only
        cat.append(_df(spark, [(f"k{i}", i, i)]), "t", ["part"])
    cat.expire_snapshots("t", keep_last=2, orphan_age_s=0.0)  # keep s3, s4
    # (2, 4] lies entirely inside retained history -> answerable
    assert {r["k"] for r in cat.read_incremental(spark, "t", 2).collect()} == {
        "k2",
        "k3",
    }
    # (1, 4] needs the expired s2 -> must refuse, not silently drop it
    with pytest.raises(ValueError, match="expired"):
        cat.read_incremental(spark, "t", 1)


def test_incremental_read_within_retained_range_still_works(spark, cat):
    cat.append(_df(spark, [("a", 1, 0)]), "t", ["part"])  # s1
    cat.append(_df(spark, [("b", 2, 1)]), "t", ["part"])  # s2
    cat.append(_df(spark, [("c", 3, 2)]), "t", ["part"])  # s3
    cat.expire_snapshots("t", keep_last=2, orphan_age_s=0.0)  # drop s1's entry
    got = {r["k"] for r in cat.read_incremental(spark, "t", 1).collect()}
    assert got == {"b", "c"}  # (1, 3] entirely inside retained history
    # s1's dir is still live (part=0 never overwritten): full read intact
    assert {r["k"] for r in cat.read(spark, "t").collect()} == {"a", "b", "c"}


def test_orphan_age_guard_spares_inflight_dirs(spark, cat):
    _churn(spark, cat)
    # default 1h age threshold: freshly-written dirs all look in-flight
    stats = cat.expire_snapshots("t", keep_last=1)
    assert stats["removed_dirs"] == []
    # second pass with the guard off sweeps them
    assert len(cat.remove_orphan_files("t", orphan_age_s=0.0)) == 2


def test_crash_between_commit_and_sweep_is_recoverable(spark, cat):
    _churn(spark, cat)
    meta = cat._load_meta("t")
    # simulate the crash: the pruned metadata committed, no sweep ran
    cat._commit_meta(
        "t",
        {
            "version": meta["version"] + 1,
            "current_snapshot_id": meta["current_snapshot_id"],
            "snapshots": meta["snapshots"][-1:],
            "live": meta["live"],
            "expired_below": meta["snapshots"][-1]["id"],
        },
    )
    assert len(_dirs(cat, "t")) == 4  # orphans still on disk
    stats = cat.expire_snapshots("t", keep_last=1, orphan_age_s=0.0)
    assert stats["expired_snapshots"] == 0  # already pruned
    assert len(stats["removed_dirs"]) == 2  # the re-collected orphans
    assert {r["k"] for r in cat.read(spark, "t").collect()} == {"a3", "c"}


def test_meta_versions_pruned(spark, cat):
    _churn(spark, cat)
    cat.expire_snapshots("t", keep_last=1, max_meta_versions=2)
    md = cat._meta_dir("t")
    files = [f for f in os.listdir(md) if f.endswith(".json")]
    assert len(files) == 2
    # the latest version is among the kept ones and still loads
    assert cat.current_snapshot_id("t") == 5


def test_keep_last_zero_rejected(spark, cat):
    _churn(spark, cat)
    with pytest.raises(ValueError, match="keep_last"):
        cat.expire_snapshots("t", keep_last=0)
