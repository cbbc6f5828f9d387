"""Source readers (SURVEY.md §2.1): the file formats the reference's
importers stream row-by-row, re-expressed as Spark scans.

- S1  CSV/TSV (≙ builder_utils.readDataset/read_csv wrappers,
      /root/reference src/graphdb_builder/builder_utils.py:27-57)
- S3  gzip line streams (≙ read_gzipped_file + per-line split,
      builder_utils.py:623-632; consumers mapping.py:183-201,
      databases/parsers/stringParser.py:36-45) — Spark decompresses
      .gz text transparently; the per-line split is a JVM-side Column
- S4  FASTA (≙ batched SeqIO reader, builder_utils.py:635-678) — the
      record separator trick: read with lineSep='>' so each row IS one
      record regardless of how many lines its sequence wraps over; no
      stateful per-partition reassembly needed
- S5  OBO ontologies (≙ obonet-based convert_obo_to_net,
      builder_utils.py:530-540 and ontologies/parsers/oboParser.py:6-50)
      — vocabulary files are dimension-sized, so the stanza parser runs
      on the driver and ships the result as an Arrow local relation

- S6  XML record dumps (≙ lxml iterparse per record tag,
      databases/parsers/hmdbParser.py:42, drugBankParser.py) — the scan
      splits on the record close tag (lineSep trick again, splittable),
      records parse per-partition in a batched Arrow UDF
- S2  Excel workbooks (≙ pd.read_excel in the experiment importers) —
      driver-side pandas -> Arrow local relation (workbooks are
      dimension-sized clinical metadata), gated on openpyxl

Everything bigger-than-dimension stays a distributed scan; only S5/S2
(vocabularies, clinical workbooks — dimension data) are driver-side by
design.
"""

from __future__ import annotations

import gzip
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from ..corpus.vocab import TERMS_SCHEMA


def read_tsv(
    spark: SparkSession,
    path: str,
    sep: str = "\t",
    header: bool = True,
    drop_all_null_rows: bool = True,
) -> DataFrame:
    """S1: delimited text with the reference's ``dropna(how='all')``
    post-filter (builder_utils.py:30-44) as a Column predicate."""
    df = (
        spark.read.option("sep", sep)
        .option("header", str(header).lower())
        .option("inferSchema", "false")
        .csv(path)
    )
    if drop_all_null_rows and df.columns:
        any_set = None
        for c in df.columns:
            cond = F.col(c).isNotNull()
            any_set = cond if any_set is None else (any_set | cond)
        df = df.filter(any_set)
    return df


def read_gzip_tsv_lines(
    spark: SparkSession,
    path: str,
    n_cols: int,
    sep: str = "\t",
    comment_prefix: str | None = None,
) -> DataFrame:
    """S3: gzip line stream -> (c0..c{n-1}) string columns. Spark's text
    source decompresses ``.gz`` transparently (one task per gz file — the
    codec is not splittable, same granularity the reference gets from one
    Python process per file)."""
    lines = spark.read.text(path)
    if comment_prefix:
        lines = lines.filter(~F.col("value").startswith(comment_prefix))
    parts = F.split("value", sep)
    # try_element_at: blank/ragged lines (routine in real gz TSV dumps)
    # yield nulls instead of an ANSI INVALID_ARRAY_INDEX job failure
    return lines.select(
        *[F.try_element_at(parts, F.lit(i + 1)).alias(f"c{i}") for i in range(n_cols)]
    )


def read_fasta(spark: SparkSession, path: str) -> DataFrame:
    """S4: (record_id, description, sequence) per FASTA record.

    ``lineSep='>'`` makes each scan row one whole record (header +
    wrapped sequence lines), so records never straddle partition logic.
    """
    recs = spark.read.option("lineSep", ">").text(path)
    recs = recs.filter(F.length(F.trim("value")) > 0)
    header = F.substring_index("value", "\n", 1)
    seq = F.regexp_replace(
        F.expr("substring(value, length(substring_index(value, '\n', 1)) + 2)"),
        r"\s+",
        "",
    )
    return recs.select(
        F.substring_index(F.trim(header), " ", 1).alias("record_id"),
        F.trim(header).alias("description"),
        seq.alias("sequence"),
    )


def parse_obo(text: str) -> list[dict[str, Any]]:
    """S5: minimal OBO stanza parser mirroring the reference's consumption
    contract (oboParser.py:22-50): per [Term] — id, name, synonyms (the
    quoted string of ``synonym:`` lines, oboParser.py:39), parents
    (``is_a``, one edge per line, oboParser.py:47-49), obsolete terms
    skipped."""
    terms: list[dict[str, Any]] = []
    cur: dict[str, Any] | None = None
    for raw in text.splitlines():
        line = raw.strip()
        if line == "[Term]":
            if cur and not cur.get("obsolete"):
                terms.append(cur)
            cur = {"id": None, "name": None, "synonyms": [], "parents": [], "obsolete": False}
        elif line.startswith("[") and line.endswith("]"):
            # any other stanza ([Typedef], [Instance]) closes the current
            # term — otherwise the typedef's id:/name: lines would
            # overwrite the last term's fields (real OBO files end with
            # [Typedef] stanzas)
            if cur and not cur.get("obsolete"):
                terms.append(cur)
            cur = None
        elif cur is not None and ":" in line:
            key, _, val = line.partition(":")
            val = val.strip()
            if key == "id":
                cur["id"] = val
            elif key == "name":
                cur["name"] = val
            elif key == "synonym":
                # synonym: "quoted text" TYPE [xrefs]
                if '"' in val:
                    cur["synonyms"].append(val.split('"')[1])
            elif key == "is_a":
                cur["parents"].append(val.split("!")[0].strip())
            elif key == "is_obsolete" and val.startswith("true"):
                cur["obsolete"] = True
    if cur and not cur.get("obsolete"):
        terms.append(cur)
    return terms


def obo_terms_df(
    spark: SparkSession, path: str, entity_type: str = "Disease"
) -> DataFrame:
    """OBO file -> terms DataFrame in the engine's vocabulary schema
    (TERMS_SCHEMA), ready for ckg_spark.canon/tag. Driver-side parse —
    ontologies are dimension tables (SURVEY.md §2.1 S5).

    TERMS_SCHEMA carries ONE parent_id per term (the first ``is_a`` line),
    which is sufficient for vocabulary/tagging use. Real OBO ontologies
    (GO, DO) are multi-parent DAGs and the reference emits one HAS_PARENT
    edge per ``is_a`` line (oboParser.py:47-49) — build hierarchy edges
    from :func:`obo_hierarchy_df`, which keeps every parent, not from this
    frame's parent_id column."""
    import pandas as pd

    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        terms = parse_obo(f.read())
    rows = {
        "id": [t["id"] for t in terms],
        "entity_type": [entity_type] * len(terms),
        "name": [t["name"] or t["id"] for t in terms],
        "synonyms": [t["synonyms"] for t in terms],
        "description": [None] * len(terms),
        "parent_id": [(t["parents"][0] if t["parents"] else None) for t in terms],
    }
    return spark.createDataFrame(pd.DataFrame(rows), TERMS_SCHEMA).coalesce(1)


def obo_hierarchy_df(spark: SparkSession, path: str) -> DataFrame:
    """All (id, parent_id) pairs of an OBO file — one row per ``is_a`` line,
    exactly the reference's HAS_PARENT edge fan-out for multi-parent DAG
    ontologies (oboParser.py:47-49). Feed this to
    ``ckg_spark.link.triples.hierarchy_edges`` (which only needs the
    id/parent_id columns) so no parent edge is dropped."""
    import pandas as pd

    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        terms = parse_obo(f.read())
    pairs = [(t["id"], p) for t in terms for p in t["parents"]]
    schema = StructType(
        [
            StructField("id", StringType(), False),
            StructField("parent_id", StringType(), False),
        ]
    )
    return spark.createDataFrame(
        pd.DataFrame({"id": [a for a, _ in pairs], "parent_id": [b for _, b in pairs]}),
        schema,
    ).coalesce(1)


def read_xml_records(
    spark: SparkSession,
    path: str,
    record_tag: str,
    fields: list[str],
    list_fields: list[str] | None = None,
) -> DataFrame:
    """S6: distributed XML record reader — one row per ``<record_tag>``
    element, scalar ``fields`` extracted as the first matching
    descendant's text, ``list_fields`` as sorted arrays of ALL matching
    descendants' texts.

    The reference streams records with lxml iterparse on the record tag
    (hmdbParser.py:42 ``etree.iterparse(..., tag=prefix+'metabolite')``,
    drugBankParser.py likewise) in one Python process per file. Here the
    SCAN splits instead: ``lineSep='</record_tag>'`` makes each text row
    exactly one record chunk (Hadoop's delimited text input is splittable,
    so a 100 GB dump parallelizes by HDFS block, not by file), and the
    parse runs per-partition in a batched Arrow UDF (stdlib ElementTree —
    the per-record semantics of iterparse without the driver-side loop).
    XML namespaces are stripped, matching the reference's
    ``prefix + field`` convention. Limitation (as in the reference's
    tag-targeted iterparse): ``record_tag`` elements must not nest within
    each other.
    """
    import pandas as pd
    import re as _re

    close = f"</{record_tag}>"
    # tag-BOUNDARY match: '<drug' must not hit '<drugbank' (the root of
    # the exact dump the docstring cites) — the opener must be followed
    # by whitespace, '>', or '/'
    open_re = _re.compile(f"<{_re.escape(record_tag)}[\\s/>]")
    scalar = list(fields)
    arrays = list(list_fields or [])
    schema = ", ".join(
        [f"`{c}` string" for c in scalar] + [f"`{c}` array<string>" for c in arrays]
    )

    def _local(tag: str) -> str:
        return tag.rsplit("}", 1)[-1]

    def parse_chunks(batches):
        import xml.etree.ElementTree as ET

        def to_row(root) -> dict[str, object]:
            row: dict[str, object] = {}
            by_tag: dict[str, list[str]] = {}
            for el in root.iter():
                t = _local(el.tag)
                if el.text is not None and el.text.strip():
                    by_tag.setdefault(t, []).append(el.text.strip())
            for c in scalar:
                vals = by_tag.get(c)
                row[c] = vals[0] if vals else None
            for c in arrays:
                row[c] = sorted(by_tag.get(c, []))
            return row

        for pdf in batches:
            rows = []
            for chunk in pdf["value"]:
                if chunk is None:
                    continue
                ms = list(open_re.finditer(chunk))
                if not ms:
                    continue  # preamble/epilogue chunk (</root>, xml decl)
                # a chunk (split on the CLOSE tag) can hold several record
                # openers: every opener before the last must be a
                # SELF-CLOSING record (no close tag can intervene — the
                # close tag is the chunk delimiter); only the final opener
                # is the record this chunk's delimiter closed. Parsing only
                # the first opener mis-rooted the fragment and silently
                # dropped both the self-closing record and its successor.
                for i, m in enumerate(ms):
                    is_last = i + 1 == len(ms)
                    seg = chunk[m.start() : len(chunk) if is_last else ms[i + 1].start()]
                    if is_last:
                        # normal record: the chunk boundary ATE its close
                        # tag — restore it. A self-closing LAST record
                        # (file tail) instead carries the root's epilogue:
                        # strip trailing close tags and parse it alone.
                        cands = (seg + close, _re.sub(r"\s*(</[^>]+>\s*)+$", "", seg))
                    else:
                        cands = (seg,)
                    for cand in cands:
                        try:
                            rows.append(to_row(ET.fromstring(cand)))
                            break
                        except ET.ParseError:
                            continue  # malformed straggler — iterparse-style skip
            yield pd.DataFrame(rows, columns=scalar + arrays)

    chunks = spark.read.option("lineSep", close).text(path)
    return chunks.mapInPandas(parse_chunks, schema=schema)


def read_excel(
    spark: SparkSession,
    path: str,
    sheet_name: str | int = 0,
    dropna_all: bool = True,
) -> DataFrame:
    """S2: Excel workbook -> DataFrame (≙ builder_utils.readDataFromExcel,
    builder_utils.py:65 ``pd.read_excel(uri, na_values=['NA'])``; the
    reference reads clinical metadata and user sheets this way).

    Workbooks are dimension-sized (experiment design / clinical sheets),
    so this is deliberately a driver-side pandas read shipped to the
    cluster as an Arrow local relation — the same pattern as the OBO
    vocabulary reader. Uses ``openpyxl`` when installed; otherwise falls
    back to the vendored stdlib parser (sources/xlsx.py) so S2 executes
    everywhere — both engines produce the same frame (paths-agree test,
    gated on openpyxl presence).
    """
    import pandas as pd

    # Only a genuinely absent openpyxl selects the stdlib fallback: an
    # ImportError raised INSIDE pd.read_excel (a .xls path needing xlrd,
    # pandas rejecting a too-old openpyxl) must propagate with its
    # actionable message, not be silently rerouted to the xlsx-only
    # fallback to die with an opaque zipfile error.
    try:
        import openpyxl  # noqa: F401

        have_openpyxl = True
    except ImportError:
        have_openpyxl = False
    if have_openpyxl:
        pdf = pd.read_excel(
            path, sheet_name=sheet_name, index_col=None, na_values=["NA"]
        )
    else:
        from .xlsx import read_xlsx_rows

        rows = read_xlsx_rows(path, sheet_name=sheet_name)
        if not rows:
            pdf = pd.DataFrame()
        else:
            # pandas parity for the header row: missing cells become
            # 'Unnamed: {i}' (not the literal 'None'), duplicates mangle
            # to 'X', 'X.1', ... — same sheet, same column names on
            # either engine (paths-agree test covers a blank header).
            header = []
            seen: dict[str, int] = {}
            for i, c in enumerate(rows[0]):
                base = f"Unnamed: {i}" if c is None else str(c)
                name = base
                # pandas keeps incrementing the suffix until the name is
                # unused: ['X', 'X.1', 'X'] -> the third 'X' must skip
                # past the LITERAL 'X.1' column to 'X.2', and each
                # generated name is itself registered so later literal
                # duplicates of it mangle too
                while name in seen:
                    seen[base] += 1
                    name = f"{base}.{seen[base]}"
                seen.setdefault(base, 0)
                seen.setdefault(name, 0)
                header.append(name)
            pdf = pd.DataFrame(rows[1:], columns=header)
            # pd.read_excel(na_values=['NA']) keeps keep_default_na=True:
            # the explicit token PLUS pandas' default NA set must map to
            # NaN or the two engines parse the same sheet differently
            na_tokens = [
                "NA", "", "#N/A", "#N/A N/A", "#NA", "-1.#IND",
                "-1.#QNAN", "-NaN", "-nan", "1.#IND", "1.#QNAN", "<NA>",
                "N/A", "NULL", "NaN", "None", "n/a", "nan", "null",
            ]
            pdf = pdf.replace(na_tokens, float("nan"))
            pdf = pdf.infer_objects()
    if dropna_all:
        pdf = pdf.dropna(how="all")
    pdf.columns = [str(c) for c in pdf.columns]
    return spark.createDataFrame(pdf)
