#!/usr/bin/env python
"""Scaling evidence for the CURATION pipeline (the training-data twin of
run_scaling.py): the same end-to-end curation run — url/exact dedup, PII
scrub, span removal, quality + LM filters, MinHash near-dup, split+pack —
at CPU-pinned local[lo] vs local[hi] over the same pre-generated corpus.

Methodology matches run_scaling.py exactly: one fresh JVM per trial,
``taskset`` pinning (an unpinned local[N] JVM rides far more than N cores),
fresh warehouse per trial (resume would skip every stage), best-of-N per
level (ambient contention on a shared host only ever slows a trial).
Appends the measured table to BENCH.md.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def gen_corpus(n_docs: int, words: str, out: str) -> None:
    """Deterministic curation input (doc_id, text, lang) from the tested
    pages generator + HTML extraction — dup_url_rate plants real exact
    duplicates so the dedup stages do representative work. Generation is
    never part of any timing."""
    code = f"""
import sys; sys.path.insert(0, {REPO!r})
from pyspark.sql import functions as F
from ckg_spark.session import get_spark
from ckg_spark.corpus.pages import config_from_vocab, generate_pages_df
from ckg_spark.corpus.vocab import VocabConfig, generate_vocab
from ckg_spark.extract import with_extracted_text

spark = get_spark("curate-gen", cores=8)
vocab = generate_vocab(VocabConfig(seed=7, terms_per_type=60))
wmin, wmax = (int(x) for x in "{words}".split(","))
cfg = config_from_vocab(vocab, n_docs={n_docs}, seed=42, partitions=32,
                        words_min=wmin, words_max=wmax)
docs = with_extracted_text(generate_pages_df(spark, cfg)).select(
    F.xxhash64("url").alias("doc_id"), "text", "lang")
docs.write.mode("overwrite").parquet({out!r})
spark.stop()
"""
    subprocess.run([sys.executable, "-c", code], check=True, capture_output=True, text=True)


def run_level(cores: int, docs_path: str, trials: int) -> list[dict]:
    results = []
    pin = ["taskset", "-c", f"0-{cores - 1}"] if cores > 1 else ["taskset", "-c", "0"]
    for t in range(trials):
        wh = tempfile.mkdtemp(prefix=f"ckg_curate_wh_{cores}_{t}_")
        # constant physical plan at BOTH levels — see run_scaling.py
        # (split size / shuffle partitioning / AQE targets are cluster
        # constants on a real N- vs 4N-executor cluster)
        env = {
            **os.environ,
            "PYTHONPATH": REPO,
            "SPARK_GRAFT_MIN_SCAN_PARTITIONS": "40",
            "SPARK_GRAFT_SHUFFLE_PARTITIONS": "16",
            "SPARK_GRAFT_AQE_COALESCE": "false",
        }
        out = subprocess.run(
            pin
            + [
                sys.executable, os.path.join(REPO, "scripts", "curate_job.py"),
                "--docs", docs_path, "--warehouse", wh,
                "--local-cores", str(cores),
            ],
            capture_output=True, text=True, check=True, cwd=REPO, env=env,
        )
        line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
        results.append(json.loads(line))
    return results


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=30_000)
    ap.add_argument("--words", default="300,600")
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--levels", default="1,4")  # see run_scaling.py: pairs
    # above 4 cores measure the hypervisor on this host's shared vCPUs
    args = ap.parse_args()
    lo, hi = (int(x) for x in args.levels.split(","))

    workdir = tempfile.mkdtemp(prefix="ckg_curate_scaling_")
    docs_path = os.path.join(workdir, "docs")
    gen_corpus(args.n_docs, args.words, docs_path)

    res_lo = run_level(lo, docs_path, args.trials)
    res_hi = run_level(hi, docs_path, args.trials)
    # determinism across levels: identical input must curate identically
    assert {r["n_curated"] for r in res_lo + res_hi} == {res_lo[0]["n_curated"]}, (
        res_lo, res_hi,
    )
    best_lo = min(res_lo, key=lambda r: r["seconds"])
    best_hi = min(res_hi, key=lambda r: r["seconds"])
    eff = (best_hi["docs_per_sec"] / best_lo["docs_per_sec"]) / (hi / lo)
    med_eff = (
        statistics.median(r["docs_per_sec"] for r in res_hi)
        / statistics.median(r["docs_per_sec"] for r in res_lo)
    ) / (hi / lo)

    summary = {
        "n_docs": args.n_docs,
        "n_curated": best_lo["n_curated"],
        "throughput_docs_per_sec": {str(lo): best_lo["docs_per_sec"], str(hi): best_hi["docs_per_sec"]},
        "scaling_efficiency": round(eff, 3),
        "scaling_efficiency_median": round(med_eff, 3),
    }
    print(json.dumps(summary, indent=1))

    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write(
            f"\n## Curation-pipeline scaling run (local[{lo}] vs local[{hi}] CPU-pinned, "
            f"{args.n_docs} docs, body {args.words} words, {args.trials} trial(s), best-of)\n\n"
            f"Same corpus, fresh warehouse per trial, n_curated identical across every "
            f"run ({best_lo['n_curated']} — the pipeline's determinism contract).\n\n"
            f"| level | seconds | input docs/sec |\n|---|---|---|\n"
        )
        for cores, r in ((lo, best_lo), (hi, best_hi)):
            f.write(f"| local[{cores}] | {r['seconds']} | {r['docs_per_sec']} |\n")
        f.write(
            f"\nCuration scaling efficiency ({lo} -> {hi} cores): **{eff:.3f}** "
            f"(median-based {med_eff:.3f})\n"
        )
        if best_lo.get("stage_seconds") and best_hi.get("stage_seconds"):
            f.write("\nPer-stage (best trials, seconds @lo / @hi / speedup): ")
            parts = []
            for st, s_lo in best_lo["stage_seconds"].items():
                s_hi = best_hi["stage_seconds"].get(st)
                if s_hi:
                    parts.append(
                        f"{st.removeprefix('curate_')} {s_lo}/{s_hi}/"
                        f"{s_lo / s_hi:.2f}x"
                    )
            f.write(", ".join(parts) + "\n")


if __name__ == "__main__":
    main()
