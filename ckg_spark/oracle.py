"""Single-process reference oracle for golden triples (SURVEY.md §5.2).

Mirrors the *semantics* the Spark pipeline must reproduce — lowercase
longest-match dictionary tagging with blocklist + language filters, alias
canonicalization, deterministic link scores — in straight-line Python with
none of the distributed machinery (no trie automaton, no LSH, no Spark).
P/R of the pipeline's (subj, pred, obj) set against this oracle is the
correctness gate (target 1.0 at fixture scale, ≥0.95 north-rule bar).

Matching machinery is intentionally different from ckg_spark/tag/aho.py:
brute-force ``str.find`` over every surface, then the same
leftmost-longest-nonoverlapping resolution — so a bug in the automaton
cannot self-confirm.
"""

from __future__ import annotations

import math
from collections import defaultdict
from dataclasses import dataclass, field

from .corpus.pages import PagesConfig, iter_pages
from .corpus.vocab import Vocab
from .canon.normalize import normalize_surface
from .extract.html_text import extract_text
from .link.triples import ASSOCIATED_WITH, HAS_PARENT, MENTIONED_IN


@dataclass
class OracleResult:
    triples: set[tuple[str, str, str]] = field(default_factory=set)
    scores: dict[tuple[str, str, str], float] = field(default_factory=dict)
    nodes: dict[str, dict] = field(default_factory=dict)
    text_by_url: dict[str, str] = field(default_factory=dict)
    canonical: dict[str, str] = field(default_factory=dict)


def _find_mentions(text: str, surface_payloads: dict[str, list[tuple[str, str]]]):
    """Brute-force leftmost-longest matching with word boundaries."""
    text_lc = text.lower()
    n = len(text_lc)
    cands: list[tuple[int, int, str]] = []
    for surface in surface_payloads:
        start = 0
        while True:
            i = text_lc.find(surface, start)
            if i < 0:
                break
            j = i + len(surface)
            before_ok = i == 0 or not (text_lc[i - 1].isalnum() and text_lc[i].isalnum())
            after_ok = j >= n or not (text_lc[j - 1].isalnum() and text_lc[j].isalnum())
            if before_ok and after_ok:
                cands.append((i, j, surface))
            start = i + 1
    cands.sort(key=lambda m: (m[0], -(m[1] - m[0])))
    picked = []
    last_end = -1
    for s, e, surface in cands:
        if s >= last_end:
            picked.append((s, e, surface))
            last_end = e
    return picked


def _merge_clusters(v: Vocab) -> dict[str, str]:
    """term id -> canonical node id under the canonicalization predicate
    (same type; one term's normalized name among the other's alias norms)."""
    alias_norms: dict[str, set[str]] = {}
    name_norm: dict[str, str] = {}
    etype: dict[str, str] = {}
    for t in v.terms:
        norms = {normalize_surface(t["name"])}
        norms.update(normalize_surface(s) for s in t["synonyms"])
        alias_norms[t["id"]] = norms
        name_norm[t["id"]] = normalize_surface(t["name"])
        etype[t["id"]] = t["entity_type"]

    parent: dict[str, str] = {t["id"]: t["id"] for t in v.terms}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: str, b: str) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    ids = sorted(parent)
    by_norm: dict[tuple[str, str], list[str]] = defaultdict(list)
    for tid in ids:
        for nrm in alias_norms[tid]:
            by_norm[(etype[tid], nrm)].append(tid)
    for tid in ids:
        for other in by_norm[(etype[tid], name_norm[tid])]:
            if other != tid:
                union(tid, other)
    return {tid: find(tid) for tid in ids}


def run_oracle(v: Vocab, pages_cfg: PagesConfig) -> OracleResult:
    res = OracleResult()
    res.canonical = _merge_clusters(v)
    blocked = {b["id"] for b in v.blocklist}
    term_info = {t["id"]: t for t in v.terms}

    # surface -> [(entity_type, term_id)] (lowercased, len>=3, like the automaton)
    surface_payloads: dict[str, list[tuple[str, str]]] = defaultdict(list)
    for a in v.aliases:
        s = a["alias"].lower().strip()
        if len(s) < 3:
            continue
        payload = (term_info[a["canonical_id"]]["entity_type"], a["canonical_id"])
        if payload not in surface_payloads[s]:
            surface_payloads[s].append(payload)

    # per-(node, url) mention accumulation
    mention_hits: dict[tuple[str, str], int] = defaultdict(int)
    doc_tokens: dict[str, int] = {}
    doc_nodes: dict[str, set[str]] = defaultdict(set)

    # id_offset must match generate_pages_df (corpus/pages.py): ids run
    # offset..offset+n_docs-1 — a 0-based range on an offset fixture would
    # make the oracle grade a disjoint corpus
    for page in iter_pages(
        pages_cfg,
        iter(range(pages_cfg.id_offset, pages_cfg.id_offset + pages_cfg.n_docs)),
    ):
        text = extract_text(page["html"])
        res.text_by_url[page["url"]] = text
        if page["lang"] != "en":
            continue
        n_tok = len(text.split())
        doc_tokens[page["url"]] = n_tok
        seen_pairs = set()
        for _s, _e, surface in _find_mentions(text, surface_payloads):
            for _etype, tid in surface_payloads[surface]:
                if tid in blocked:
                    continue
                node = res.canonical[tid]
                mention_hits[(node, page["url"])] += 1
                seen_pairs.add(node)
        doc_nodes[page["url"]] |= seen_pairs

    # mention edges
    for (node, url), hits in mention_hits.items():
        key = (node, MENTIONED_IN, url)
        res.triples.add(key)
        res.scores[key] = round(hits / math.sqrt(doc_tokens[url]), 6)

    # co-mention edges
    pair_docs: dict[tuple[str, str], int] = defaultdict(int)
    for url, nodes in doc_nodes.items():
        snodes = sorted(nodes)
        for i in range(len(snodes)):
            for j in range(i + 1, len(snodes)):
                pair_docs[(snodes[i], snodes[j])] += 1
    for (a, b), cnt in pair_docs.items():
        key = (a, ASSOCIATED_WITH, b)
        res.triples.add(key)
        res.scores[key] = float(cnt)

    # hierarchy edges
    for t in v.terms:
        if t["parent_id"] is None:
            continue
        c = res.canonical[t["id"]]
        p = res.canonical[t["parent_id"]]
        if c != p:
            key = (c, HAS_PARENT, p)
            res.triples.add(key)
            res.scores[key] = 1.0

    # entity nodes (cluster reps)
    clusters: dict[str, list[str]] = defaultdict(list)
    for tid, node in res.canonical.items():
        clusters[node].append(tid)
    for node, members in clusters.items():
        rep = term_info[min(members)]
        surfaces: set[str] = set()
        for m in members:
            surfaces.add(term_info[m]["name"])
            surfaces.update(term_info[m]["synonyms"])
        res.nodes[node] = {
            "label": rep["entity_type"],
            "name": rep["name"],
            "synonyms": sorted(surfaces),
        }
    return res


def precision_recall(
    got: set[tuple[str, str, str]], expected: set[tuple[str, str, str]]
) -> tuple[float, float]:
    if not got and not expected:
        return 1.0, 1.0
    tp = len(got & expected)
    p = tp / len(got) if got else 0.0
    r = tp / len(expected) if expected else 0.0
    return p, r
