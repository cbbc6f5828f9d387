#!/usr/bin/env python
"""Sub-stage profiler for the link/materialize scaling investigation.

Two modes:

  --prepare: build a warehouse (tag + canon committed) from an existing
      pages corpus, so link/materialize can be profiled in isolation.
  --profile: against that warehouse, time the link and materialize
      sub-phases and report partition counts at each step (the scaling
      question is usually "how many tasks did the expensive narrow work
      actually get").

Run each profile level in its own pinned subprocess, same convention as
run_scaling.py:

  python scripts/profile_stages.py --prepare --pages /tmp/.../pages_raw --wh /tmp/ckg_prof_wh
  taskset -c 0-3 python scripts/profile_stages.py --profile --cores 4 --wh /tmp/ckg_prof_wh
  taskset -c 0 python scripts/profile_stages.py --profile --cores 1 --wh /tmp/ckg_prof_wh
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--prepare", action="store_true")
    ap.add_argument("--profile", action="store_true")
    ap.add_argument("--pages", default=None)
    ap.add_argument("--wh", required=True)
    ap.add_argument("--cores", type=int, default=4)
    ap.add_argument("--terms-per-type", type=int, default=150)
    args = ap.parse_args()

    from ckg_spark.session import get_spark

    spark = get_spark("profile", cores=args.cores)
    spark.sparkContext.setLogLevel("ERROR")

    from ckg_spark.corpus.vocab import VocabConfig, generate_vocab
    from ckg_spark.corpus.pages import config_from_vocab

    vocab_cfg = VocabConfig(seed=7, terms_per_type=args.terms_per_type)

    if args.prepare:
        from ckg_spark.pipeline import KGPipeline

        if os.path.exists(args.wh):
            shutil.rmtree(args.wh)
        pages = spark.read.parquet(args.pages)
        n_docs = pages.count()
        vocab = generate_vocab(vocab_cfg)
        pages_cfg = config_from_vocab(vocab, n_docs=n_docs, seed=42)
        pipe = KGPipeline(spark, args.wh, vocab_cfg=vocab_cfg, pages_cfg=pages_cfg)
        stats = pipe.run(pages=pages)
        print(json.dumps({"prepared": args.wh, "n_docs": n_docs,
                          "n_triples": stats["n_triples"]}))
        return

    assert args.profile
    from pyspark.sql import functions as F

    from ckg_spark.corpus.vocab import vocab_dataframes
    from ckg_spark.lakehouse import Warehouse
    from ckg_spark.link.triples import (
        comention_edges, hierarchy_edges, mention_edges, mentions_per_url,
        node_dictionary,
    )
    from ckg_spark.materialize.graph import build_nodes, materialize_graph

    vocab = generate_vocab(vocab_cfg)
    terms, _aliases, _bl = vocab_dataframes(spark, vocab)
    wh = Warehouse(args.wh)
    mentions = wh.table("mentions").read(spark)
    cmap = wh.table("canonical_map").read(spark)

    out: dict = {"cores": args.cores}

    # ---- link sub-phases -------------------------------------------------
    t0 = time.perf_counter()
    nd = node_dictionary(cmap)
    per_url = mentions_per_url(mentions, cmap, node_dict=nd).localCheckpoint(
        eager=True
    )
    out["L1_per_url_ckpt_s"] = round(time.perf_counter() - t0, 3)
    out["L1_partitions"] = per_url.rdd.getNumPartitions()

    t0 = time.perf_counter()
    triples = (
        mention_edges(per_url, nd)
        .unionByName(comention_edges(per_url, nd, min_score=None))
        .unionByName(hierarchy_edges(terms, cmap))
    )
    tmp_out = os.path.join(args.wh, "_prof_triples")
    triples.write.mode("overwrite").partitionBy("pred").parquet(tmp_out)
    out["L2_write_s"] = round(time.perf_counter() - t0, 3)

    from ckg_spark.lakehouse import _walk_row_counts

    t0 = time.perf_counter()
    files = _walk_row_counts(tmp_out)
    out["L3_manifest_s"] = round(time.perf_counter() - t0, 3)
    out["L3_files"] = len(files)

    # ---- materialize sub-phases -----------------------------------------
    # fresh side warehouse so merges see empty tables (the bench scenario)
    mat_wh = Warehouse(os.path.join(args.wh, "_prof_mat"))
    if os.path.exists(mat_wh.root):
        shutil.rmtree(mat_wh.root)
    triples_r = spark.read.parquet(tmp_out)
    mention_urls = triples_r.filter("pred = 'MENTIONED_IN_PUBLICATION'").select(
        F.col("obj").alias("url")
    )
    total_edges = sum(f["rows"] or 0 for f in files)

    t0 = time.perf_counter()
    nodes = build_nodes(terms, cmap, mention_urls=mention_urls)
    stats = materialize_graph(
        spark, mat_wh, nodes, triples_r, total_edges=total_edges
    )
    out["M_total_s"] = round(time.perf_counter() - t0, 3)
    out["M_orphans"] = stats["orphan_edges"]

    print(json.dumps(out))


if __name__ == "__main__":
    main()
