"""The spark-submit --py-files deployment path (north rule) builds the
graph end-to-end from the zipped package."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_submit_build_end_to_end(spark, vocab, tmp_path):
    from ckg_spark.corpus.pages import config_from_vocab, generate_pages_df

    pages_dir = str(tmp_path / "pages")
    cfg = config_from_vocab(vocab, n_docs=300, seed=42, partitions=4)
    generate_pages_df(spark, cfg).write.parquet(pages_dir)

    wh = str(tmp_path / "wh")
    export_dir = str(tmp_path / "bulk")
    out = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "scripts", "submit_build.py"),
            "--pages", pages_dir, "--warehouse", wh,
            "--master", "local[4]", "--terms-per-type", "30",
            "--export-dir", export_dir,
        ],
        capture_output=True, text=True, timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    stats = json.loads(
        [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    )
    assert stats["n_triples"] > 0 and stats["orphan_edges"] == 0
    # the deployment path also emits the reference's bulk-import artifact
    assert stats["export"]["n_edges"] == stats["n_triples"]
    import glob

    assert glob.glob(os.path.join(export_dir, "edges", "_type=*", "*.csv"))
    # the graph tables exist and are readable by an independent session
    edges = spark.read.parquet(*[
        os.path.join(wh, "edges", d)
        for d in os.listdir(os.path.join(wh, "edges"))
        if d.startswith("data-")
    ])
    assert edges.count() == stats["n_triples"]


def test_submit_curate_end_to_end(spark, tmp_path):
    docs_dir = str(tmp_path / "docs")
    rows = [
        (i, f"a genuinely useful document number {i} with plenty of distinct "
            f"words in it and also token{i} token{i+1} token{i+2} for variety "
            "so that the filters keep it around", "en")
        for i in range(40)
    ] + [(100, "dup text", "en"), (101, "dup text", "en")]
    spark.createDataFrame(rows, "doc_id long, text string, lang string").write.parquet(
        docs_dir
    )

    wh = str(tmp_path / "whc")
    out = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "scripts", "submit_curate.py"),
            "--docs", docs_dir, "--warehouse", wh, "--master", "local[4]",
            "--no-lm-filter",
        ],
        capture_output=True, text=True, timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    stats = json.loads(
        [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    )
    assert stats["n_curated"] > 0
    assert stats["rows"]["exact_dedup"] == 41  # one of the two dups dropped
    from ckg_spark.lakehouse import Warehouse

    cur = Warehouse(wh).table("curated_documents").read(spark)
    assert {"split", "bucket"} <= set(cur.columns)
    assert cur.count() == stats["n_curated"]
