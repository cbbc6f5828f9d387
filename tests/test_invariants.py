"""Property/invariant tests (SURVEY.md §5.3): partition-permutation
invariance, extractor determinism under hypothesis-generated inputs, and
normalization idempotence."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from ckg_spark.canon.normalize import normalize_surface
from ckg_spark.extract.html_text import extract_text


@given(st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_normalize_is_idempotent_and_order_insensitive(s):
    n = normalize_surface(s)
    assert normalize_surface(n) == n
    toks = s.split()
    assert normalize_surface(" ".join(reversed(toks))) == normalize_surface(" ".join(toks))


@given(st.binary(max_size=500))
@settings(max_examples=200, deadline=None)
def test_extract_text_total_and_deterministic(b):
    """The extractor must accept ANY byte string (north rule: pure function
    of the html bytes) and be bit-stable."""
    t1 = extract_text(b)
    t2 = extract_text(b)
    assert t1 == t2
    assert t1 is None or isinstance(t1, str)


def test_pipeline_output_invariant_to_input_partitioning(spark, vocab, tmp_path):
    """Shuffled/partition-count-changed input pages produce the identical
    sorted triple set (no partition-order dependence anywhere)."""
    from ckg_spark.corpus.pages import config_from_vocab, generate_pages_df
    from ckg_spark.corpus.vocab import vocab_dataframes
    from ckg_spark.canon import build_canonical_map
    from ckg_spark.link import all_triples
    from ckg_spark.tag import build_automaton, tag_pages_fused

    cfg = config_from_vocab(vocab, n_docs=150, seed=42, partitions=8)
    pages = generate_pages_df(spark, cfg)
    terms, _, blocklist = vocab_dataframes(spark, vocab)
    etype = {t["id"]: t["entity_type"] for t in vocab.terms}
    ac_bc = spark.sparkContext.broadcast(
        build_automaton(
            [{**a, "entity_type": etype[a["canonical_id"]]} for a in vocab.aliases]
        )
    )
    cmap = build_canonical_map(terms)

    def triples_of(p):
        m = tag_pages_fused(p, ac_bc, blocklist=blocklist)
        return sorted(
            (r["subj"], r["pred"], r["obj"], r["score"])
            for r in all_triples(m, terms, cmap).collect()
        )

    base = triples_of(pages)
    # different partitioning + shuffled row order
    repart = pages.repartition(3, "url")
    assert triples_of(repart) == base
    coalesced = pages.orderBy("warc_ts").coalesce(1)
    assert triples_of(coalesced) == base
