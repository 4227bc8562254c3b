"""Manifest-consistent reads: the sharded export's _MANIFEST.json is the
snapshot; a reader that goes through it must be immune to stray files a
concurrent writer drops into the directory, while a naive directory scan
is provably torn by them."""

from __future__ import annotations

import os
import shutil

import pandas as pd


def _docs_dir(tmp_path, n=20):
    d = tmp_path / "corpus"
    d.mkdir()
    pd.DataFrame(
        {
            "doc_id": range(n),
            "text": [f"doc {i} text" for i in range(n)],
            "lang": ["en"] * n,
            "source": ["src0"] * n,
            "n_chars": [10 + i for i in range(n)],
        }
    ).to_parquet(str(d / "documents.parquet"))
    return str(d)


def test_manifest_read_ignores_stray_files(spark, tmp_path):
    from kinesis3_spark.queries.llmprep import (
        _MANIFEST_NAME,
        _manifest_files,
        _sharded_export,
        export_manifest_consistent_read,
    )

    sf = _docs_dir(tmp_path)
    before = export_manifest_consistent_read(spark, sf).collect()[0].asDict()
    assert before["n_docs"] == 20

    # a concurrent writer drops a stray (duplicate) data file mid-export
    path = _sharded_export(spark, sf)
    manifest = set(_manifest_files(path))
    a_file = sorted(manifest)[0]
    stray = os.path.join(
        os.path.dirname(a_file), "part-stray-not-in-manifest.parquet"
    )
    shutil.copyfile(a_file, stray)

    after = export_manifest_consistent_read(spark, sf).collect()[0].asDict()
    assert after == before  # manifest read: byte-identical

    naive = spark.read.parquet(path).count()
    assert naive > before["n_docs"]  # directory read is torn by the stray

    # the manifest file itself is invisible to directory scans (underscore
    # prefix) but present on disk
    assert os.path.exists(os.path.join(path, _MANIFEST_NAME))


def test_manifest_covers_exactly_the_written_files(spark, tmp_path):
    from kinesis3_spark.queries.llmprep import _manifest_files, _sharded_export

    sf = _docs_dir(tmp_path)
    path = _sharded_export(spark, sf)
    on_disk = {
        os.path.join(root, f)
        for root, _dirs, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    }
    assert set(_manifest_files(path)) == on_disk and on_disk
