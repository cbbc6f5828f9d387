"""Source readers (SURVEY.md §2.1 S1/S3/S4/S5): TSV with all-null-row
dropping, gzip line streams, FASTA via the lineSep trick, OBO -> vocab
schema, and OBO terms flowing straight into the tagger."""

from __future__ import annotations

import gzip

from ckg_spark.sources import (
    obo_terms_df,
    parse_obo,
    read_fasta,
    read_gzip_tsv_lines,
    read_tsv,
)

OBO_FIXTURE = """format-version: 1.2

[Term]
id: DOID:0001
name: angiosarcoma
synonym: "hemangiosarcoma" EXACT []
is_a: DOID:0000 ! cancer

[Term]
id: DOID:0002
name: old disease
is_obsolete: true

[Term]
id: DOID:0003
name: gastric cancer
synonym: "stomach cancer" EXACT []
synonym: "cancer of stomach" RELATED []
is_a: DOID:0000 ! cancer
"""


def test_read_tsv_drops_all_null_rows(spark, tmp_path):
    p = tmp_path / "t.tsv"
    p.write_text("a\tb\n1\tx\n\t\n2\ty\n")
    df = read_tsv(spark, str(p))
    rows = sorted((r["a"], r["b"]) for r in df.collect())
    assert rows == [("1", "x"), ("2", "y")]


def test_read_gzip_tsv_lines(spark, tmp_path):
    p = tmp_path / "data.tsv.gz"
    with gzip.open(p, "wt") as f:
        f.write("# comment\np1\tp2\t900\np3\tp4\t150\n")
    df = read_gzip_tsv_lines(spark, str(p), n_cols=3, comment_prefix="#")
    rows = sorted(tuple(r) for r in df.collect())
    assert rows == [("p1", "p2", "900"), ("p3", "p4", "150")] or rows == sorted(
        [("p1", "p2", "900"), ("p3", "p4", "150")]
    )


def test_read_fasta_multiline_records(spark, tmp_path):
    p = tmp_path / "seqs.fasta"
    p.write_text(
        ">sp|P1|X test protein\nMKT\nLLI\n>sp|P2|Y other\nGGG\n"
    )
    recs = {r["record_id"]: r["sequence"] for r in read_fasta(spark, str(p)).collect()}
    assert recs == {"sp|P1|X": "MKTLLI", "sp|P2|Y": "GGG"}


def test_parse_obo_skips_obsolete_and_collects_synonyms():
    terms = parse_obo(OBO_FIXTURE)
    by_id = {t["id"]: t for t in terms}
    assert set(by_id) == {"DOID:0001", "DOID:0003"}
    assert by_id["DOID:0003"]["synonyms"] == ["stomach cancer", "cancer of stomach"]
    assert by_id["DOID:0001"]["parents"] == ["DOID:0000"]


def test_obo_terms_feed_the_tagger(spark, tmp_path):
    from ckg_spark.tag import build_automaton, tag_mentions

    p = tmp_path / "do.obo"
    p.write_text(OBO_FIXTURE)
    terms = obo_terms_df(spark, str(p))
    rows = terms.collect()
    assert {r["id"] for r in rows} == {"DOID:0001", "DOID:0003"}
    alias_rows = []
    for r in rows:
        alias_rows.append(
            {"canonical_id": r["id"], "source": "NAME", "alias": r["name"], "entity_type": "Disease"}
        )
        for s in r["synonyms"]:
            alias_rows.append(
                {"canonical_id": r["id"], "source": "SYN", "alias": s, "entity_type": "Disease"}
            )
    ac_bc = spark.sparkContext.broadcast(build_automaton(alias_rows))
    pages = spark.createDataFrame(
        [("u1", "patient with stomach cancer and angiosarcoma", "en")],
        ["url", "text", "lang"],
    )
    got = {
        (r["url"], r["canonical_id"]): r["n_hits"]
        for r in tag_mentions(pages, ac_bc).collect()
    }
    assert got == {("u1", "DOID:0001"): 1, ("u1", "DOID:0003"): 1}


MULTIPARENT_OBO = """format-version: 1.2

[Term]
id: DOID:0010
name: cardia cancer
is_a: DOID:0001 ! angiosarcoma
is_a: DOID:0003 ! gastric cancer
"""


def test_obo_multiparent_hierarchy_edges(spark, tmp_path):
    """ADVICE r1 regression: multi-parent DAG terms must emit one
    HAS_PARENT edge per is_a line (oboParser.py:47-49), not parents[0]."""
    from ckg_spark.link.triples import hierarchy_edges
    from ckg_spark.sources.readers import obo_hierarchy_df

    p = tmp_path / "dag.obo"
    p.write_text(OBO_FIXTURE + MULTIPARENT_OBO)
    hier = obo_hierarchy_df(spark, str(p))
    pairs = {(r["id"], r["parent_id"]) for r in hier.collect()}
    assert pairs == {
        ("DOID:0001", "DOID:0000"),
        ("DOID:0003", "DOID:0000"),
        ("DOID:0010", "DOID:0001"),
        ("DOID:0010", "DOID:0003"),
    }
    # identity canonical map: hierarchy_edges only needs id/parent_id
    ids = sorted({i for pr in pairs for i in pr})
    cmap = spark.createDataFrame(
        [(i, i) for i in ids], ["term_id", "node_id"]
    )
    edges = hierarchy_edges(hier, cmap)
    got = {(r["subj"], r["obj"]) for r in edges.collect()}
    assert got == pairs


# ----------------------------------------------------------------------
# S6: XML record reader
# ----------------------------------------------------------------------

def test_read_xml_records(spark, tmp_path):
    from ckg_spark.sources.readers import read_xml_records

    xml = """<?xml version="1.0" encoding="UTF-8"?>
<hmdb xmlns="http://www.hmdb.ca">
  <metabolite>
    <accession>HMDB0000001</accession>
    <name>1-Methylhistidine</name>
    <synonym>Pi-methylhistidine</synonym>
    <synonym>1-MHis</synonym>
    <disease><name>Kidney disease</name></disease>
  </metabolite>
  <metabolite>
    <accession>HMDB0000002</accession>
    <name>1,3-Diaminopropane</name>
  </metabolite>
</hmdb>
"""
    p = tmp_path / "dump.xml"
    p.write_text(xml)
    df = read_xml_records(
        spark, str(p), "metabolite",
        fields=["accession", "name"], list_fields=["synonym"],
    )
    rows = {r["accession"]: r for r in df.collect()}
    assert set(rows) == {"HMDB0000001", "HMDB0000002"}
    # namespaced tags resolve; scalar field takes the FIRST match in
    # document order (the record's own <name>, not the nested disease's)
    assert rows["HMDB0000001"]["name"] == "1-Methylhistidine"
    assert rows["HMDB0000001"]["synonym"] == ["1-MHis", "Pi-methylhistidine"]
    assert rows["HMDB0000002"]["synonym"] == []
    # epilogue chunk (</hmdb>) and xml declaration were skipped, not rows


def test_read_xml_records_multifile_and_malformed(spark, tmp_path):
    from ckg_spark.sources.readers import read_xml_records

    (tmp_path / "a.xml").write_text(
        "<r><rec><id>1</id></rec><rec><id>2</id></rec></r>"
    )
    # malformed record chunk is skipped, valid ones survive
    (tmp_path / "b.xml").write_text(
        "<r><rec><id>3</id></rec><rec><id>4</id><broken></rec></r>"
    )
    df = read_xml_records(spark, str(tmp_path), "rec", fields=["id"])
    got = sorted(r["id"] for r in df.collect())
    assert got == ["1", "2", "3"]


# ----------------------------------------------------------------------
# S2: Excel reader (gated on openpyxl)
# ----------------------------------------------------------------------

def _col_letter(i: int) -> str:
    s = ""
    i += 1
    while i:
        i, r = divmod(i - 1, 26)
        s = chr(65 + r) + s
    return s


def _write_minimal_xlsx(path, sheets: dict[str, list[list]]) -> None:
    """Test-only stdlib xlsx writer (full OPC structure so openpyxl can
    read it too): shared-string text cells, numeric, boolean, sparse."""
    import zipfile

    shared: list[str] = []

    def cell_xml(ref, v):
        if v is None:
            return ""
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>'
        if isinstance(v, str):
            if v not in shared:
                shared.append(v)
            return f'<c r="{ref}" t="s"><v>{shared.index(v)}</v></c>'
        return f'<c r="{ref}"><v>{v}</v></c>'

    sheet_parts = {}
    for si, (name, rows) in enumerate(sheets.items(), start=1):
        body = []
        for ri, row in enumerate(rows, start=1):
            cells = "".join(
                cell_xml(f"{_col_letter(ci)}{ri}", v)
                for ci, v in enumerate(row)
            )
            body.append(f'<row r="{ri}">{cells}</row>')
        sheet_parts[f"xl/worksheets/sheet{si}.xml"] = (
            '<?xml version="1.0"?><worksheet xmlns="http://schemas.'
            'openxmlformats.org/spreadsheetml/2006/main"><sheetData>'
            + "".join(body)
            + "</sheetData></worksheet>"
        )
    sheet_tags = "".join(
        f'<sheet name="{n}" sheetId="{i}" r:id="rId{i}"/>'
        for i, n in enumerate(sheets, start=1)
    )
    rel_tags = "".join(
        f'<Relationship Id="rId{i}" Type="http://schemas.openxmlformats.'
        'org/officeDocument/2006/relationships/worksheet" '
        f'Target="worksheets/sheet{i}.xml"/>'
        for i in range(1, len(sheets) + 1)
    )
    n_rel = len(sheets) + 1
    sst = (
        '<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.'
        f'org/spreadsheetml/2006/main" count="{len(shared)}" '
        f'uniqueCount="{len(shared)}">'
        + "".join(f"<si><t>{s}</t></si>" for s in shared)
        + "</sst>"
    )
    overrides = "".join(
        f'<Override PartName="/xl/worksheets/sheet{i}.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.'
        'worksheet+xml"/>'
        for i in range(1, len(sheets) + 1)
    )
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0"?><Types xmlns="http://schemas.'
            'openxmlformats.org/package/2006/content-types">'
            '<Default Extension="rels" ContentType="application/vnd.'
            'openxmlformats-package.relationships+xml"/>'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Override PartName="/xl/workbook.xml" ContentType='
            '"application/vnd.openxmlformats-officedocument.spreadsheetml.'
            'sheet.main+xml"/>'
            '<Override PartName="/xl/sharedStrings.xml" ContentType='
            '"application/vnd.openxmlformats-officedocument.spreadsheetml.'
            'sharedStrings+xml"/>' + overrides + "</Types>",
        )
        zf.writestr(
            "_rels/.rels",
            '<?xml version="1.0"?><Relationships xmlns="http://schemas.'
            'openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.'
            'org/officeDocument/2006/relationships/officeDocument" '
            'Target="xl/workbook.xml"/></Relationships>',
        )
        zf.writestr(
            "xl/workbook.xml",
            '<?xml version="1.0"?><workbook xmlns="http://schemas.'
            'openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://'
            'schemas.openxmlformats.org/officeDocument/2006/relationships">'
            f"<sheets>{sheet_tags}</sheets></workbook>",
        )
        zf.writestr(
            "xl/_rels/workbook.xml.rels",
            '<?xml version="1.0"?><Relationships xmlns="http://schemas.'
            'openxmlformats.org/package/2006/relationships">' + rel_tags
            + f'<Relationship Id="rId{n_rel}" Type="http://schemas.'
            'openxmlformats.org/officeDocument/2006/relationships/'
            'sharedStrings" Target="sharedStrings.xml"/></Relationships>',
        )
        zf.writestr("xl/sharedStrings.xml", sst)
        for name, xml in sheet_parts.items():
            zf.writestr(name, xml)


def test_read_excel_roundtrip_ungated(spark, tmp_path):
    """S2 runs in THIS environment: the vendored stdlib parser backs
    read_excel when openpyxl is absent (VERDICT r02 #6)."""
    from ckg_spark.sources.readers import read_excel

    p = str(tmp_path / "x.xlsx")
    _write_minimal_xlsx(
        p,
        {
            "meta": [
                ["subject", "group", "dose", "note"],
                ["s1", "treated", 2.5, "ok"],
                ["s2", "control", 3, "NA"],  # 'NA' -> NaN (na_values)
                ["s3", "treated", None, None],  # sparse cells
                [None, None, None, None],  # all-empty -> dropna(how=all)
            ],
            "other": [["zz"], ["ignored"]],
        },
    )
    df = read_excel(spark, p)
    rows = {r["subject"]: r for r in df.collect()}
    assert set(df.columns) == {"subject", "group", "dose", "note"}
    assert set(rows) == {"s1", "s2", "s3"}
    assert rows["s1"]["dose"] == 2.5 and rows["s1"]["note"] == "ok"
    assert rows["s2"]["dose"] == 3.0 and rows["s2"]["note"] is None
    assert rows["s3"]["dose"] is None
    # sheet selection by name and by index agree
    by_name = read_excel(spark, p, sheet_name="other")
    assert by_name.columns == ["zz"] and by_name.count() == 1
    by_idx = read_excel(spark, p, sheet_name=1)
    assert by_idx.columns == ["zz"] and by_idx.count() == 1


def test_read_excel_fallback_matches_openpyxl(spark, tmp_path):
    """Paths-agree: when the optional engine IS present, both read the
    same frame (skips where openpyxl is absent)."""
    import pytest

    pytest.importorskip("openpyxl")
    import pandas as pd

    from ckg_spark.sources.readers import read_excel
    from ckg_spark.sources.xlsx import read_xlsx_rows

    p = str(tmp_path / "y.xlsx")
    _write_minimal_xlsx(
        p, {"s": [["a", "b"], [1, "x"], [2.5, "y"], [3, None]]}
    )
    via_pd = pd.read_excel(p, na_values=["NA"])
    rows = read_xlsx_rows(p, 0)
    assert [str(c) for c in via_pd.columns] == [str(c) for c in rows[0]]
    got = pd.DataFrame(rows[1:], columns=rows[0])
    assert via_pd.where(pd.notna(via_pd), None).values.tolist() == [
        [None if pd.isna(v) else v for v in r]
        for r in got.where(pd.notna(got), None).values.tolist()
    ]
    assert read_excel(spark, p).count() == 3


def test_read_excel_fallback_blank_and_dup_headers(spark, tmp_path):
    """ADVICE r3: the stdlib fallback must name header cells the way
    pandas.read_excel does — a missing header cell becomes
    'Unnamed: {i}' (not the literal 'None') and duplicates mangle to
    'X', 'X.1' — so the same sheet parses to the same column names
    whichever engine is installed (and duplicate names can't collide)."""
    from ckg_spark.sources.readers import read_excel
    from ckg_spark.sources.xlsx import read_xlsx_rows

    p = str(tmp_path / "hdr.xlsx")
    _write_minimal_xlsx(
        p, {"s": [["a", None, "a", "b"], [1, 2, 3, 4], [5, 6, 7, 8]]}
    )
    df = read_excel(spark, p)
    # identical on both engines: pandas' own convention when openpyxl is
    # installed, the fallback's pandas-mirroring naming otherwise
    assert list(df.columns) == ["a", "Unnamed: 1", "a.1", "b"]
    assert df.count() == 2
    # raw fallback rows still carry the None so the naming is ours
    assert read_xlsx_rows(p, 0)[0][1] is None


def test_read_excel_fallback_mangled_name_collides_with_literal(
    spark, tmp_path
):
    """ADVICE r4: for header ['X', 'X.1', 'X'] the third 'X' must mangle
    PAST the literal 'X.1' column to 'X.2' — pandas keeps incrementing
    the suffix until the candidate name is unused, so a single-step
    mangle would emit two 'X.1' columns."""
    from ckg_spark.sources.readers import read_excel

    p = str(tmp_path / "hdrclash.xlsx")
    _write_minimal_xlsx(
        p, {"s": [["X", "X.1", "X"], [1, 2, 3], [4, 5, 6]]}
    )
    df = read_excel(spark, p)
    assert list(df.columns) == ["X", "X.1", "X.2"]
    assert df.count() == 2


def test_read_excel_inner_importerror_propagates(tmp_path, monkeypatch):
    """ADVICE r3: an ImportError raised INSIDE pd.read_excel (e.g. a
    .xls path needing xlrd) must propagate with its actionable message —
    only a genuinely absent openpyxl selects the stdlib fallback."""
    import sys

    import pytest

    import ckg_spark.sources.readers as readers

    spark_unused = None
    fake = type(sys)("openpyxl")
    monkeypatch.setitem(sys.modules, "openpyxl", fake)
    import pandas as pd

    def boom(*a, **k):
        raise ImportError("Missing optional dependency 'xlrd'")

    monkeypatch.setattr(pd, "read_excel", boom)
    with pytest.raises(ImportError, match="xlrd"):
        readers.read_excel(spark_unused, str(tmp_path / "z.xls"))


def test_read_xml_records_root_shares_tag_prefix(spark, tmp_path):
    """Review regression: record tag 'drug' inside root 'drugbank' — the
    prefix match must not treat the root as the first record."""
    from ckg_spark.sources.readers import read_xml_records

    (tmp_path / "d.xml").write_text(
        '<drugbank xmlns="http://x"><drug><id>D1</id></drug>'
        "<drug><id>D2</id></drug></drugbank>"
    )
    df = read_xml_records(spark, str(tmp_path / "d.xml"), "drug", fields=["id"])
    assert sorted(r["id"] for r in df.collect()) == ["D1", "D2"]


def test_read_xml_records_self_closing(spark, tmp_path):
    """Self-closing records have no close tag, so they ride inside the
    NEXT record's chunk (or the epilogue chunk at file tail) — both the
    self-closing record and its successor must survive."""
    from ckg_spark.sources.readers import read_xml_records

    (tmp_path / "a.xml").write_text(
        '<r><rec id="ignored"><id>1</id></rec>'
        "<rec/><rec><id>2</id></rec>"   # self-closing mid-file
        "<rec/><rec/><rec><id>3</id></rec>"  # two adjacent self-closing
        "<rec><id>4</id></rec><rec/></r>"  # self-closing at file tail
    )
    df = read_xml_records(spark, str(tmp_path), "rec", fields=["id"])
    got = sorted((r["id"] or "-") for r in df.collect())
    assert got == ["-", "-", "-", "-", "1", "2", "3", "4"]
