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


def test_bloom_survives_merge_on_read_delete(spark, tmp_path):
    """Code-review r11 (medium): delete_where hardlink-carried the bloom
    parquet but dropped _META.json, leaving the sidecar unreadable and
    silently un-maintained afterwards. The META now carries; deleted
    keys staying bloom-admitted is the allowed false-positive side."""
    df = spark.range(120).select(
        F.col("id").alias("event_id"),
        F.col("id").cast("double").alias("value"),
    ).repartition(4, "event_id")
    root = str(tmp_path / "mor")
    M.publish_overwrite(spark, root, df, bloom_columns=["event_id"])
    M.delete_where(
        spark, root, F.col("event_id") % 7 == 0, keys=["event_id"]
    )
    v2 = M._published_version(root)
    snap2 = os.path.join(root, v2)
    assert FS.bloom_sidecar_columns(snap2) == ["event_id"]
    keep, total = FS.bloom_prune_files(spark, snap2, "event_id", [8])
    got = (
        spark.read.parquet(*keep).filter(F.col("event_id") == 8).count()
    )
    assert got == 1


def test_bloom_partial_coverage_never_false_negative(spark, tmp_path):
    """Files without a bloom row (written by a path that does not
    maintain the sidecar) are ALWAYS candidates — a stale sidecar
    degrades to less pruning, never wrong results."""
    df = spark.range(100).select(
        F.col("id").alias("event_id"),
        F.col("id").cast("double").alias("value"),
    ).repartition(4, "event_id")
    root = str(tmp_path / "partial")
    v = M.publish_overwrite(spark, root, df, bloom_columns=["event_id"])
    snap = os.path.join(root, v)
    # Simulate an unmaintained write: drop a data file into the
    # snapshot AFTER the sidecar was committed.
    extra = spark.createDataFrame([(10_007, 1.0)], "event_id long, value double")
    extra.coalesce(1).write.mode("append").parquet(snap)
    keep, total = FS.bloom_prune_files(spark, snap, "event_id", [10_007])
    got = (
        spark.read.parquet(*keep)
        .filter(F.col("event_id") == 10_007)
        .count()
    )
    assert got == 1  # the uncovered file was admitted unconditionally
    assert total == 5  # total counts DATA files, not bloom rows


def test_bloom_survives_partition_evolution_and_compaction(spark, tmp_path):
    """Code-review r11 (medium): the first evolution relocated the
    sidecar META-less under _layout-0, so compact_evolved's rebuild
    found no columns. The sidecar now carries at the version root with
    layout-prefixed row paths, stays probe-safe while evolved, and the
    compaction rebuild finds it."""
    from myserver_datawarehouse_spark.operators import evolution as EV

    df = spark.range(90).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 2).cast("string").alias("part"),
        F.col("id").cast("double").alias("value"),
    )
    root = str(tmp_path / "evo")
    M.publish_overwrite(
        spark, root, df.repartition(3, "event_id"),
        bloom_columns=["event_id"],
    )
    EV.evolve_partition_spec(spark, root, ["part"])
    v_evolved = M._published_version(root)
    snap_e = os.path.join(root, v_evolved)
    assert FS.bloom_sidecar_columns(snap_e) == ["event_id"]
    keep, _t = FS.bloom_prune_files(spark, snap_e, "event_id", [11])
    assert any("_layout-0" in p for p in keep)
    got = (
        spark.read.parquet(*keep).filter(F.col("event_id") == 11).count()
    )
    assert got == 1
    # Evolved merge writes new (uncovered) files, then compaction
    # rebuilds the full index.
    EV.evolved_merge(
        spark, root,
        spark.createDataFrame(
            [(10_011, "0", 5.0)], "event_id long, part string, value double"
        ),
        keys=["event_id"],
    )
    EV.compact_evolved(spark, root)
    snap_c = os.path.join(root, M._published_version(root))
    assert FS.bloom_sidecar_columns(snap_c) == ["event_id"]
    keep, total = FS.bloom_prune_files(
        spark, snap_c, "event_id", [10_011, 11]
    )
    got = (
        spark.read.parquet(*keep)
        .filter(F.col("event_id").isin(10_011, 11))
        .count()
    )
    assert got == 2
    # full rebuild: every data file covered again
    covered = {
        r["path"]
        for r in spark.read.parquet(
            os.path.join(snap_c, "_blooms", "event_id")
        ).select("path").collect()
    }
    assert covered == set(FS._data_files_relative(snap_c))


def test_bloom_prune_casts_probe_keys_to_column_type(spark, tmp_path):
    """Code-review r11: string probe keys (the CLI path) cast to the
    sidecar's recorded type for ANY column type; an uncastable key
    raises instead of silently hashing NULL."""
    root, snap = _publish_events(spark, tmp_path, key_type="long")
    keep_s, _ = FS.bloom_prune_files(spark, snap, "event_id", ["7", "42"])
    keep_i, _ = FS.bloom_prune_files(spark, snap, "event_id", [7, 42])
    assert sorted(keep_s) == sorted(keep_i)
    with pytest.raises(ValueError, match="cast"):
        FS.bloom_prune_files(spark, snap, "event_id", ["not-a-number"])


def test_bloom_carry_through_evolved_merge(spark, tmp_path):
    """Round-12 (VERDICT r11 missing #2): evolved merges maintain the
    sidecar incrementally — new active-layout files get fresh bloom
    rows at commit, so coverage stays FULL instead of decaying to
    always-candidates, and a probe on a key living only in post-
    evolution files still prunes."""
    from myserver_datawarehouse_spark.operators import evolution as EV

    df = spark.range(120).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 2).cast("string").alias("part"),
        F.col("id").cast("double").alias("value"),
    )
    root = str(tmp_path / "evocarry")
    M.publish_overwrite(
        spark, root, df.repartition(4, "event_id"),
        bloom_columns=["event_id"],
    )
    EV.evolve_partition_spec(spark, root, ["part"])
    batch = spark.createDataFrame(
        [(20_001, "0", 5.0), (20_002, "1", 6.0), (11, "1", 99.0)],
        "event_id long, part string, value double",
    )
    EV.evolved_merge(spark, root, batch, keys=["event_id"])
    snap = os.path.join(root, M._published_version(root))
    covered = {
        r["path"]
        for r in spark.read.parquet(
            os.path.join(snap, "_blooms", "event_id")
        ).select("path").collect()
    }
    assert covered == set(FS._data_files_relative(snap)), (
        "evolved merge must leave the sidecar covering every data file"
    )
    # a key that exists ONLY in the merge's new files still prunes
    keep, total = FS.bloom_prune_files(spark, snap, "event_id", [20_001])
    assert len(keep) < total
    got = spark.read.option("basePath", os.path.join(snap, "_layout-1")) \
        .parquet(*[p for p in keep if "_layout-1" in p]) \
        .filter(F.col("event_id") == 20_001).count()
    assert got == 1


def test_bloom_carry_through_evolved_append(spark, tmp_path):
    from myserver_datawarehouse_spark.operators import evolution as EV

    df = spark.range(60).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 2).cast("string").alias("part"),
        F.col("id").cast("double").alias("value"),
    )
    root = str(tmp_path / "evoappend")
    M.publish_overwrite(
        spark, root, df.repartition(3, "event_id"),
        bloom_columns=["event_id"],
    )
    EV.evolve_partition_spec(spark, root, ["part"])
    EV.evolved_append(
        spark, root,
        spark.createDataFrame(
            [(30_001, "0", 1.0)], "event_id long, part string, value double"
        ),
    )
    snap = os.path.join(root, M._published_version(root))
    covered = {
        r["path"]
        for r in spark.read.parquet(
            os.path.join(snap, "_blooms", "event_id")
        ).select("path").collect()
    }
    assert covered == set(FS._data_files_relative(snap))
    keep, total = FS.bloom_prune_files(spark, snap, "event_id", [30_001])
    assert len(keep) < total


def test_bloom_partition_column_falls_back_to_verbatim_carry(spark, tmp_path):
    """A bloom column that becomes a PARTITION column of the active
    layout is not physically in its data files — maintenance must fall
    back to the verbatim carry (partial coverage, never a crash, never
    a false negative)."""
    from myserver_datawarehouse_spark.operators import evolution as EV

    df = spark.range(40).select(
        (F.col("id") % 4).cast("string").alias("grp"),
        F.col("id").alias("event_id"),
        F.col("id").cast("double").alias("value"),
    )
    root = str(tmp_path / "evopartcol")
    M.publish_overwrite(
        spark, root, df.repartition(2, "grp"), bloom_columns=["grp"]
    )
    EV.evolve_partition_spec(spark, root, ["grp"])
    EV.evolved_merge(
        spark, root,
        spark.createDataFrame(
            [("9", 50_001, 1.0)], "grp string, event_id long, value double"
        ),
        keys=["event_id"],
    )
    snap = os.path.join(root, M._published_version(root))
    # partial coverage is expected; the probe must still be safe:
    # the new file (grp=9) is uncovered -> always a candidate.
    keep, _total = FS.bloom_prune_files(spark, snap, "grp", ["9"])
    hits = [p for p in keep if "_layout-1" in p]
    assert hits, "uncovered new file must remain a candidate"
    # review finding (r12): the fallback carry prunes rows for files
    # the commit dropped, so the sidecar keeps the paths-subset
    # invariant instead of accumulating dead rows across merges.
    covered = {
        r["path"]
        for r in spark.read.parquet(
            os.path.join(snap, "_blooms", "grp")
        ).select("path").collect()
    }
    assert covered <= set(FS._data_files_relative(snap))


def test_read_pruned_applies_deletes(spark, tmp_path):
    """ADVICE r11 #3: a raw spark.read.parquet(*keep) bypasses
    merge-on-read deletes and can resurface logically deleted rows;
    read_pruned pairs pruning with the snapshot's anti-join."""
    root, snap = _publish_events(spark, tmp_path, n=200, files=4)
    M.delete_where(spark, root, F.col("event_id") == 7, keys=["event_id"])
    snap2 = os.path.join(root, M._published_version(root))
    # the bloom still probes positive for the deleted key (delete_where
    # carries the sidecar verbatim) — the raw read would resurface it
    keep, _t = FS.bloom_prune_files(spark, snap2, "event_id", [7])
    raw = (
        spark.read.parquet(*keep)
        .filter(F.col("event_id") == 7)
        .count()
    )
    assert raw == 1, "precondition: raw pruned read resurfaces the row"
    got = (
        FS.read_pruned(spark, snap2, "event_id", [7])
        .filter(F.col("event_id") == 7)
        .count()
    )
    assert got == 0, "read_pruned must apply the _deletes sidecar"


def test_read_pruned_evolved_layouts_and_partition_columns(spark, tmp_path):
    """read_pruned on an evolved snapshot: per-layout delete
    application and hive partition-column recovery via basePath."""
    from myserver_datawarehouse_spark.operators import evolution as EV

    df = spark.range(80).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 2).cast("string").alias("part"),
        F.col("id").cast("double").alias("value"),
    )
    root = str(tmp_path / "evoread")
    M.publish_overwrite(
        spark, root, df.repartition(4, "event_id"),
        bloom_columns=["event_id"],
    )
    EV.evolve_partition_spec(spark, root, ["part"])
    # update key 11: legacy copy must die via the layout-0 delete
    # sidecar even on the pruned read path
    EV.evolved_merge(
        spark, root,
        spark.createDataFrame(
            [(11, "1", 1234.5)], "event_id long, part string, value double"
        ),
        keys=["event_id"],
    )
    snap = os.path.join(root, M._published_version(root))
    rows = (
        FS.read_pruned(spark, snap, "event_id", [11])
        .filter(F.col("event_id") == 11)
        .collect()
    )
    assert len(rows) == 1, "legacy superseded copy must not resurface"
    assert rows[0].value == 1234.5
    assert rows[0].part == "1", "partition column must survive leaf read"


def test_write_bloom_sidecar_path_contract_guard(spark, tmp_path):
    """ADVICE r11 #1: the sidecar's write-time guard asserts its row
    paths equal the snapshot's data files, so a URI-slicing breakage
    (symlinked/percent-encoded table paths) fails loudly at write time
    instead of silently degrading carry and coverage."""
    root, snap = _publish_events(spark, tmp_path)
    # healthy table: guard passes (implicitly, publish succeeded) and
    # the committed sidecar covers exactly the data files
    covered = {
        r["path"]
        for r in spark.read.parquet(
            os.path.join(snap, "_blooms", "event_id")
        ).select("path").collect()
    }
    assert covered == set(FS._data_files_relative(snap))
    with pytest.raises(ValueError, match="not data"):
        FS._assert_sidecar_paths(
            spark,
            os.path.join(snap, "_blooms", "event_id"),
            {"some/other/file.parquet"},
        )
