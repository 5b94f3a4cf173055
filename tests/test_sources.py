"""Source-side ingest policies: malformed-record handling (f16's
quarantine path) — DROPMALFORMED loss accounting plus the PERMISSIVE
corrupt-record capture that a production pipeline would route to a
quarantine sink instead of silently dropping."""

from __future__ import annotations

import pyspark.sql.functions as F

from k_means_clustering_via_map_reduce_spark.queries import (
    F16_BAD_MOD,
    F16_SCHEMA,
    staged_malformed_csv,
)
from k_means_clustering_via_map_reduce_spark.sources import load_table


def test_f16_permissive_quarantines_exactly_the_corrupted_rows(
    spark, sf_dir
):
    d = load_table(spark, sf_dir, "documents")
    n_total = d.count()
    n_bad_expected = d.filter(F.col("doc_id") % F16_BAD_MOD == 0).count()
    path = staged_malformed_csv(spark, sf_dir)

    perm = (
        spark.read.schema(F16_SCHEMA + ", _corrupt_record STRING")
        .options(
            sep="|",
            mode="PERMISSIVE",
            columnNameOfCorruptRecord="_corrupt_record",
        )
        .csv(path)
        .cache()  # Spark disallows corrupt-column-only queries on raw CSV
    )
    try:
        assert perm.count() == n_total  # PERMISSIVE loses nothing
        bad = perm.filter(F.col("_corrupt_record").isNotNull())
        assert bad.count() == n_bad_expected
        # Quarantined rows keep their raw line for replay/repair.
        sample = bad.limit(5).collect()
        assert all("|CORRUPT" in r["_corrupt_record"] for r in sample)
        # The parse-failed numeric field is NULL, parseable prefix intact.
        assert all(r["n_chars"] is None for r in sample)
    finally:
        perm.unpersist()

    dropped = (
        spark.read.schema(F16_SCHEMA)
        .options(sep="|", mode="DROPMALFORMED")
        .csv(path)
    )
    # TRAP: a bare .count() on a DROPMALFORMED CSV scan is optimized to
    # skip field parsing entirely, so malformed rows are never detected
    # and the count comes back UNFILTERED (all 500). Any query that
    # actually reads columns (f16's aggregate, or this collect) parses
    # and drops correctly — but loss accounting must touch the data.
    assert dropped.count() == n_total  # the documented count-only trap
    assert len(dropped.collect()) == n_total - n_bad_expected


def test_f17_sink_commit_protocol(spark, sf_dir):
    """The custom sink's commit discipline: every committed file is
    listed in the manifest, row counts add up, and no .tmp residue
    survives (rename-on-close means readers never see torn files)."""
    import json
    import os
    import tempfile

    from k_means_clustering_via_map_reduce_spark.sources.python_source import (
        write_jsonl_sink,
    )

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    n_in = d.count()
    with tempfile.TemporaryDirectory(prefix="f17_test_") as out:
        write_jsonl_sink(d.repartition(4), out)
        names = sorted(os.listdir(out))
        files = [n for n in names if n.endswith(".jsonl")]
        assert len(files) == 4
        assert not [n for n in names if n.endswith(".tmp")]
        man = json.load(open(os.path.join(out, "_MANIFEST.json")))
        assert man["files"] == files
        assert man["rows"] == n_in
        n_lines = sum(
            1
            for f in files
            for _ in open(os.path.join(out, f))
        )
        assert n_lines == n_in


def test_f17_sink_retry_attempt_isolation(tmp_path):
    """A task retry / speculative duplicate writes its OWN attempt file
    (never sharing a path with a live attempt), and driver-side
    commit() promotes only the winning attempt per partition, sweeping
    the loser and any torn .tmp — the failure modes commit protocols
    exist for. Driver-side logic is exercised directly: two attempt
    files for partition 0 exist, Spark delivered one winner."""
    import json
    import os

    from k_means_clustering_via_map_reduce_spark.sources.python_source import (
        JsonlCommit,
        JsonlSinkWriter,
    )

    out = str(tmp_path)
    win, lose = "part-00000-a7.jsonl", "part-00000-a3.jsonl"
    open(os.path.join(out, win), "w").write('{"doc_id": 1}\n')
    open(os.path.join(out, lose), "w").write('{"doc_id": 1}\n')
    # a third attempt died mid-write: torn .tmp never renamed
    open(os.path.join(out, lose + ".tmp"), "w").write('{"doc')

    w = JsonlSinkWriter({"path": out}, overwrite=False)
    w.commit([JsonlCommit(filename=win, n_rows=1, part_id=0)])

    names = sorted(os.listdir(out))
    assert names == ["_MANIFEST.json", "part-00000.jsonl"]
    man = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert man == {"files": ["part-00000.jsonl"], "rows": 1}
    # abort path: attempt residue is removed, committed finals stay
    open(os.path.join(out, "part-00001-a9.jsonl.tmp"), "w").write("x")
    w.abort([None])
    assert sorted(os.listdir(out)) == ["_MANIFEST.json", "part-00000.jsonl"]


def test_f18_versioned_table_time_travel(spark, sf_dir, tmp_path):
    """The versioned-table contract: (1) a later append does NOT change
    a version-N read; (2) an aborted commit — data files written, crash
    before the manifest rename — leaves nothing visible to any reader;
    (3) a racing commit to the same version slot loses loudly instead
    of clobbering the winner's snapshot."""
    import os

    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        commit_append,
        latest_version,
        read_version,
    )

    root = str(tmp_path)
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    assert commit_append(d.filter(F.col("doc_id") % 3 == 0), root) == 1
    v1_before = sorted(r.doc_id for r in read_version(spark, root, 1).collect())

    assert commit_append(d.filter(F.col("doc_id") % 3 != 0), root) == 2
    v1_after = sorted(r.doc_id for r in read_version(spark, root, 1).collect())
    assert v1_after == v1_before  # later append invisible at version 1
    assert len(read_version(spark, root).collect()) == d.count()

    # aborted commit: data dir written, no manifest ever linked
    orphan = os.path.join(root, "data", "txn-00003-deadbeef")
    d.limit(5).write.parquet(orphan)
    assert latest_version(root) == 2
    assert sorted(
        r.doc_id for r in read_version(spark, root).collect()
    ) == sorted(r.doc_id for r in d.collect())  # orphans invisible

    # racing commit: both committers read parent=2; the winner links
    # v3 while the loser is still writing data files — the loser's
    # link must fail loudly, never clobber. Pin the loser's parent
    # view to simulate the interleaving.
    import json
    from unittest import mock

    import k_means_clustering_via_map_reduce_spark.sources.versioned as V

    man3 = os.path.join(root, "_manifests", "v00003.json")
    json.dump({"version": 3, "parent": 2, "files": [], "added": []},
              open(man3, "w"))
    with mock.patch.object(V, "latest_version", return_value=2):
        try:
            commit_append(d.limit(1), root)
            raised = False
        except FileExistsError:
            raised = True
    assert raised
    assert json.load(open(man3))["files"] == []  # winner untouched


def test_f18_vacuum_and_retention(spark, sf_dir, tmp_path):
    """The lifecycle tail: expire_versions drops old manifests (their
    exclusive time travel stops), vacuum deletes exactly the data files
    no surviving manifest references (aborted-commit orphans included),
    and every surviving version still reads bit-identically after both
    — reachability is computed from existing manifests, so vacuum can
    never break a readable version."""
    import os

    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        commit_append,
        expire_versions,
        latest_version,
        read_version,
        vacuum,
    )

    root = str(tmp_path)
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    commit_append(d.filter(F.col("doc_id") % 3 == 0), root)
    commit_append(d.filter(F.col("doc_id") % 3 == 1), root)
    commit_append(d.filter(F.col("doc_id") % 3 == 2), root)
    # an aborted commit's orphan data dir
    d.limit(7).write.parquet(os.path.join(root, "data", "txn-00004-dead"))

    before_v2 = sorted(r.doc_id for r in read_version(spark, root, 2).collect())
    before_v3 = sorted(r.doc_id for r in read_version(spark, root, 3).collect())

    assert expire_versions(root, keep_last=2) == [1]
    removed = vacuum(root, retention_seconds=0.0)
    # v1's files are all referenced by v2/v3 (cumulative manifests), so
    # only the orphan txn dir may be collected
    assert removed and all("txn-00004-dead" in p for p in removed)
    assert not os.path.exists(os.path.join(root, "data", "txn-00004-dead"))

    assert latest_version(root) == 3
    assert sorted(
        r.doc_id for r in read_version(spark, root, 2).collect()
    ) == before_v2
    assert sorted(
        r.doc_id for r in read_version(spark, root, 3).collect()
    ) == before_v3
    # the expired version is genuinely gone
    import pytest

    with pytest.raises(FileNotFoundError):
        read_version(spark, root, 1)


def test_f19_static_overwrite_wipes_dynamic_preserves(spark, sf_dir):
    """The trap f19 exists to pin, contrasted live: the SAME
    INSERT OVERWRITE of one source's rows wipes every other partition
    under the default STATIC mode but preserves them under dynamic —
    so a deployment that forgot the conf loses data silently. (f19's
    oracle catches the wipeout; this test demonstrates the mechanism.)
    """
    import os
    import shutil
    from urllib.parse import urlparse

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars", "source"
    )
    n_sources = d.select("source").distinct().count()
    warehouse = urlparse(
        spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    ).path
    web = d.filter(F.col("source") == "src3")
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    try:
        for mode, expect_sources in (
            ("static", 1),          # wipeout: only 'web' survives
            ("dynamic", n_sources), # restatement: everything survives
        ):
            spark.sql("DROP TABLE IF EXISTS f19_mode_probe")
            shutil.rmtree(
                os.path.join(warehouse, "f19_mode_probe"),
                ignore_errors=True,
            )
            d.write.partitionBy("source").saveAsTable("f19_mode_probe")
            spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", mode
            )
            web.write.mode("overwrite").insertInto("f19_mode_probe")
            spark.catalog.refreshTable("f19_mode_probe")
            got = (
                spark.table("f19_mode_probe")
                .select("source")
                .distinct()
                .count()
            )
            assert got == expect_sources, (mode, got)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        spark.sql("DROP TABLE IF EXISTS f19_mode_probe")


def test_f20_compaction_physical_rewrite_only(spark, sf_dir, tmp_path):
    """Compaction contract: the compacted version plans FEWER files
    with identical row content; pre-compaction time travel is
    untouched; and expire+vacuum after compaction reclaims the small
    files while the compacted version still reads fully — the complete
    small-file repair loop."""
    import os

    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        compact,
        commit_append,
        expire_versions,
        read_manifest,
        read_version,
        vacuum,
    )

    root = str(tmp_path)
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    for i in range(3):
        commit_append(d.filter(F.col("doc_id") % 3 == i).repartition(4), root)
    assert len(read_manifest(root, 3)["files"]) == 12  # the pathology
    v2_before = sorted(r.doc_id for r in read_version(spark, root, 2).collect())

    v = compact(spark, root, target_files=2)
    assert v == 4
    man = read_manifest(root, v)
    assert len(man["files"]) == 2 and man["compacted_from"] == 3
    assert sorted(r.doc_id for r in read_version(spark, root, v).collect()) == \
        sorted(r.doc_id for r in d.collect())
    # pre-compaction time travel untouched
    assert sorted(
        r.doc_id for r in read_version(spark, root, 2).collect()
    ) == v2_before

    # reclamation: expire everything but the compacted version, vacuum
    # must delete all 12 small files and keep the 2 compacted ones
    expire_versions(root, keep_last=1)
    removed = vacuum(root, retention_seconds=0.0)
    assert len(removed) == 12, removed
    live = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(os.path.join(root, "data"))
        for f in fs
        if f.endswith(".parquet")
    ]
    assert len(live) == 2
    assert sorted(r.doc_id for r in read_version(spark, root, v).collect()) == \
        sorted(r.doc_id for r in d.collect())


def test_f20_compaction_on_empty_table_refuses(tmp_path):
    import pytest

    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        compact,
    )

    with pytest.raises(ValueError):
        compact(None, str(tmp_path))
