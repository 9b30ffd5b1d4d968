"""Committed per-file bloom sidecars (sources/files.py): write-commit
registration, typed probe correctness (the xxhash64 type-sensitivity
contract), empty-probe guard, and incremental carry across a
copy-on-write merge (round-11 close of the standing bloom weak —
VERDICT r10 #6 / ADVICE items 1-2)."""

import json
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from myserver_datawarehouse_spark.operators import merge as M
from myserver_datawarehouse_spark.sources import files as FS


def _publish_events(spark, tmp_path, n=400, files=8, key_col="event_id",
                    key_type="long"):
    if key_type == "long":
        key = F.col("id")
    elif key_type == "int":
        key = F.col("id").cast("int")
    else:
        key = F.concat(F.lit("k"), F.col("id").cast("string"))
    df = (
        spark.range(n)
        .select(
            key.alias(key_col),
            (F.col("id") % 7).alias("grp"),
            (F.col("id") * 2).cast("double").alias("value"),
        )
        .repartition(files, key_col)
    )
    root = str(tmp_path / f"tbl_{key_type}")
    v = M.publish_overwrite(spark, root, df, bloom_columns=[key_col])
    return root, os.path.join(root, v)


def test_bloom_commit_prunes_without_false_negatives(spark, tmp_path):
    root, snap = _publish_events(spark, tmp_path)
    assert FS.bloom_sidecar_columns(snap) == ["event_id"]
    keep, total = FS.bloom_prune_files(spark, snap, "event_id", [5, 123])
    assert total == 8
    # False-negative check is the contract: every row with a probed key
    # must survive the pruned read.
    got = (
        spark.read.parquet(*keep)
        .filter(F.col("event_id").isin(5, 123))
        .count()
    )
    assert got == 2
    # Hash layout: each key lives in one file, so pruning must bite.
    assert len(keep) < total


@pytest.mark.parametrize("key_type", ["int", "string"])
def test_bloom_probe_uses_written_type(spark, tmp_path, key_type):
    """ADVICE r10 (medium): the probe used to hardcode `long`, but
    xxhash64 is type-sensitive — an int/string key column hashed to
    different buckets at probe time than at write time, producing
    false NEGATIVES. The probe now builds its frame with the type
    recorded in _META.json."""
    root, snap = _publish_events(spark, tmp_path, key_type=key_type)
    probes = [7, 42] if key_type == "int" else ["k7", "k42"]
    meta = json.load(
        open(os.path.join(snap, "_blooms", "event_id", "_META.json"))
    )
    assert meta["type"] == ("int" if key_type == "int" else "string")
    keep, total = FS.bloom_prune_files(spark, snap, "event_id", probes)
    got = (
        spark.read.parquet(*keep)
        .filter(F.col("event_id").isin(*probes))
        .count()
    )
    assert got == 2  # zero false negatives with the typed probe


def test_bloom_empty_probe_returns_no_candidates(spark, tmp_path):
    root, snap = _publish_events(spark, tmp_path)
    keep, total = FS.bloom_prune_files(spark, snap, "event_id", [])
    assert keep == [] and total == 8


def test_bloom_wrong_column_raises(spark, tmp_path):
    root, snap = _publish_events(spark, tmp_path)
    with pytest.raises(FileNotFoundError):
        FS.bloom_prune_files(spark, snap, "grp", [1])


def test_bloom_carry_across_merge_is_incremental(spark, tmp_path):
    """merge_upsert_published on a partitioned bloom-indexed table:
    hardlink-carried partitions keep their bloom rows byte-identical
    (copied from the old sidecar, not recomputed), rewritten partitions
    get fresh rows, and the post-merge probe still has zero false
    negatives — commit cost O(touched partitions)."""
    df = (
        spark.range(300)
        .select(
            F.col("id").alias("event_id"),
            (F.col("id") % 3).cast("string").alias("part"),
            F.col("id").cast("double").alias("value"),
        )
    )
    root = str(tmp_path / "merged")
    M.publish_overwrite(
        spark, root, df, partition_by=["part"], bloom_columns=["event_id"]
    )
    v1 = M._published_version(root)
    old_rows = {
        r["path"]: bytes(r["bloom"])
        for r in spark.read.parquet(
            os.path.join(root, v1, "_blooms", "event_id")
        ).collect()
    }
    # Update rows only in partition "1" (plus a brand-new key there).
    updates = spark.createDataFrame(
        [Row(event_id=1, part="1", value=999.0),
         Row(event_id=10_001, part="1", value=1.0)]
    )
    M.merge_upsert_published(
        spark, root, updates, keys=["event_id"], partition_by=["part"]
    )
    v2 = M._published_version(root)
    assert v2 != v1
    snap2 = os.path.join(root, v2)
    new_rows = {
        r["path"]: bytes(r["bloom"])
        for r in spark.read.parquet(
            os.path.join(snap2, "_blooms", "event_id")
        ).collect()
    }
    # Every data file has a bloom row; carried partitions ("0", "2")
    # kept their old rows verbatim.
    assert set(new_rows) == set(FS._data_files_relative(snap2))
    carried = [p for p in new_rows if not p.startswith("part=1")]
    assert carried, "expected untouched partitions to be carried"
    for p in carried:
        assert new_rows[p] == old_rows[p]
    # Rewritten partition got fresh paths (new files) — and the new key
    # is findable through the sidecar.
    keep, total = FS.bloom_prune_files(
        spark, snap2, "event_id", [10_001, 7]
    )
    got = (
        spark.read.parquet(*keep)
        .filter(F.col("event_id").isin(10_001, 7))
        .count()
    )
    assert got == 2


def test_merge_upsert_published_rejects_evolved_snapshot(spark, tmp_path):
    """ADVICE r10 (low): the plain manifest-root merge must refuse an
    evolved multi-layout current snapshot instead of silently dropping
    the untouched `_layout-*` subtrees."""
    df = spark.range(10).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 2).cast("string").alias("part"),
    )
    root = str(tmp_path / "evolved")
    v = M.publish_overwrite(spark, root, df, partition_by=["part"])
    # Minimal evolved marker: the guard keys on _SPECS.json presence.
    with open(os.path.join(root, v, "_SPECS.json"), "w") as fh:
        json.dump([], fh)
    with pytest.raises(RuntimeError, match="evolved"):
        M.merge_upsert_published(
            spark, root,
            spark.range(1).select(
                F.col("id").alias("event_id"), F.lit("0").alias("part")
            ),
            keys=["event_id"], partition_by=["part"],
        )


def test_bloom_survives_compaction(spark, tmp_path):
    """Compaction (the full-rewrite maintenance op) rebuilds committed
    bloom sidecars over the new snapshot instead of dropping the
    index."""
    df = spark.range(200).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 2).cast("string").alias("part"),
    )
    root = str(tmp_path / "compacted")
    M.publish_overwrite(
        spark, root,
        df.repartition(6, "event_id"),
        partition_by=["part"],
        bloom_columns=["event_id"],
    )
    M.compact_table(spark, root)
    v2 = M._published_version(root)
    snap2 = os.path.join(root, v2)
    assert FS.bloom_sidecar_columns(snap2) == ["event_id"]
    keep, total = FS.bloom_prune_files(spark, snap2, "event_id", [77])
    got = (
        spark.read.parquet(*keep)
        .filter(F.col("event_id") == 77)
        .count()
    )
    assert got == 1


def test_cli_table_bloom_and_prune(spark, tmp_path, capsys):
    from myserver_datawarehouse_spark.__main__ import main

    df = spark.range(100).select(
        F.col("id").alias("event_id"),
        F.col("id").cast("double").alias("value"),
    ).repartition(4, "event_id")
    root = str(tmp_path / "cli_tbl")
    M.publish_overwrite(spark, root, df)
    rc = main(["table", "bloom", root, "--column", "event_id"])
    assert rc == 0
    assert "per-file point-lookup blooms" in capsys.readouterr().out
    rc = main(
        ["table", "prune", root, "--column", "event_id",
         "--probe-keys", "7,42"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    first = out.splitlines()[0]
    kept, total = first.split()[0].split("/")
    assert int(total) == 4 and 1 <= int(kept) <= 4
