"""Config-driven report pipeline — the engine's twin of the reference's
``report_manager/dataset.py`` (Dataset.generate_report, :204-281) and the
per-dataset YAML configs under ``report_manager/config/*.yml``.

The reference walks an ordered config of sections → subsections, each
naming an input frame, a list of analysis types, and args; it runs every
analysis through the analytics factory, records which analyses ran (the
"report pipeline"), and for regulation-style analyses (ttest / anova)
additionally stores the significant subset of the data as ``regulated``
plus the full test output as ``regulation table`` (dataset.py:254-261).

This twin keeps the exact walk order and storage semantics but stays
distributed end-to-end:

- inputs and results are Spark DataFrames; analyses dispatch through
  ``ckg_spark.analysis.run_analysis`` (every handler is a DataFrame plan);
- the reference's ``sig_data = data[sig_hits]`` wide-column selection
  becomes a broadcast semi-join of the long-format data against the
  rejected identifiers (dimension-sized — the t-test output);
- the top-level ``args`` block drives the measurements-ready prep
  (``prepare_processed``) exactly like the reference's proteomics config
  (config/proteomics.yml args: imputation/missing_* →
  get_proteomics_measurements_ready, dataset.py via analytics_factory);
- ``store_analysis: True`` results persist to the lakehouse warehouse
  when one is supplied (replacing the reference's HDF5 report store,
  dataset.py:299-324) — snapshot-committed, so reports are resumable
  and time-travelable like every other table.

Nothing here collects corpus-scale data: the only driver-side state is
the config walk and the report manifest.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .analysis import run_analysis
from .prep import measurements_ready

# analyses whose output carries (identifier, rejected) regulation flags —
# the reference special-cases exactly ttest/anova/samr (dataset.py:254)
_REGULATION_ANALYSES = {"ttest", "anova", "mannwhitney", "wilcoxon"}


@dataclass
class Report:
    """Ordered record of what ran and what it produced (≙ the reference's
    Report of plots + the report_pipeline dict it attaches,
    dataset.py:206,280). ``analyses`` maps "<subsection>_<analysis>" to
    the result DataFrame; ``stored`` the frames persisted for downstream
    steps; ``pipeline`` the JSON-able manifest of the executed steps."""

    identifier: str
    analyses: dict[str, DataFrame] = field(default_factory=dict)
    stored: dict[str, DataFrame] = field(default_factory=dict)
    pipeline: list[dict[str, Any]] = field(default_factory=list)


def prepare_processed(
    frames: dict[str, DataFrame], args: dict[str, Any]
) -> dict[str, DataFrame]:
    """Materialize ``frames['processed']`` from ``frames['measurements']``
    per the config's top-level args block — the reference runs
    get_proteomics_measurements_ready with these exact knobs before any
    section executes (config/proteomics.yml args:, analytics.py:545-607).
    No-op when the config doesn't ask for prep or ``processed`` exists."""
    if "processed" in frames or "measurements" not in frames or not args:
        return frames
    raw_method = str(args.get("imputation_method", "mixed")).lower()
    _METHODS = {"distribution": "downshift", "mixed": "mixed", "knn": "knn"}
    if raw_method not in _METHODS:
        # fail loudly: silently falling back to 'mixed' would switch
        # imputation semantics on a config typo and change the regulated
        # hit lists with no signal (analysis.py raises for unknown
        # normalization/correction names; prep must too)
        raise ValueError(
            f"unknown imputation_method {raw_method!r}: "
            f"expected one of {sorted(_METHODS)}"
        )
    method = _METHODS[raw_method]
    group_col = args.get("group_col", "group")
    sample_col = args.get("sample_col", "sample")
    feature_col = args.get("feature_col", "identifier")
    value_col = args.get("value_col", "value")
    ready = measurements_ready(
        frames["measurements"],
        sample_col=sample_col,
        feature_col=feature_col,
        value_col=value_col,
        group_col=group_col,
        missing_method=args.get("missing_method", "percentage"),
        missing_max=float(args.get("missing_max", 0.3)),
        min_valid=int(args.get("min_valid", 1)),
        missing_per_group=bool(args.get("missing_per_group", True)),
        imputation=method if args.get("imputation", True) else None,
        shift=float(args.get("missing_shift", 1.8)),
        knn_cutoff=float(args.get("knn_cutoff", 0.6)),
    )
    out = dict(frames)
    # measurements_ready keeps the caller's column names; only the value
    # column comes back as value_ready (+ a per-cell method column)
    out["processed"] = ready.select(
        group_col,
        sample_col,
        feature_col,
        F.col("value_ready").alias(value_col),
    )
    return out


def _regulated_subset(
    data: DataFrame, result: DataFrame, args: dict[str, Any]
) -> DataFrame | None:
    """The reference's sig-hits extraction (dataset.py:254-258): rows of
    the input data whose identifier the test rejected. Wide-format column
    slicing becomes a broadcast LEFT SEMI join — the rejected-identifier
    frame is dimension-sized (one row per tested feature)."""
    if "rejected" not in result.columns:
        return None
    id_col = args.get("feature_col", args.get("identifier_col", "identifier"))
    res_id = "identifier" if "identifier" in result.columns else id_col
    if res_id not in result.columns or id_col not in data.columns:
        return None
    sig = result.filter(F.col("rejected") == 1).select(
        F.col(res_id).alias(id_col)
    ).distinct()
    return data.join(F.broadcast(sig), id_col, "left_semi")


def generate_report(
    identifier: str,
    frames: dict[str, DataFrame],
    config: dict[str, Any],
    warehouse=None,
) -> Report:
    """Run the configured analysis pipeline (≙ Dataset.generate_report,
    dataset.py:204-281). ``config`` mirrors the reference YAML:

        args: {imputation: true, imputation_method: mixed, ...}
        <section>:
          <subsection>:
            data: processed            # name in ``frames``
            analyses: [ttest]          # ckg_spark.analysis types
            store_analysis: true
            args: {group_col: group, ...}

    Sections and subsections execute in config order (dicts preserve
    insertion order — the reference relies on the same). A subsection
    whose input frame is absent is skipped and recorded as such, exactly
    like the reference's ``if data is not None`` guard. Results are keyed
    "<subsection>_<analysis>"; regulation-style analyses additionally
    store ``regulated`` + ``regulation table`` when ``store_analysis``.
    With a :class:`~ckg_spark.lakehouse.Warehouse`, every stored frame
    commits as ``report_<identifier>_<key>`` snapshots."""
    top_args = config.get("args", {}) or {}
    frames = prepare_processed(frames, top_args)
    report = Report(identifier=identifier)

    def _store(key: str, df: DataFrame) -> None:
        report.stored[key] = df
        if warehouse is not None:
            safe = key.replace(" ", "_")
            warehouse.table(f"report_{identifier}_{safe}").overwrite(df)

    for section, subsections in config.items():
        if section == "args" or not isinstance(subsections, dict):
            continue
        for subsection, spec in subsections.items():
            data_name = spec.get("data")
            analyses = spec.get("analyses", []) or []
            sub_args = {**top_args, **(spec.get("args", {}) or {})}
            store = bool(spec.get("store_analysis", False))
            step = {
                "section": section,
                "subsection": subsection,
                "data": data_name,
                "analyses": [],
                "skipped": False,
            }
            data = frames.get(data_name)
            if data is None:
                step["skipped"] = True
                report.pipeline.append(step)
                continue
            if not analyses and store:
                # no-analysis subsections store the named data as-is
                # (dataset.py:268-275 stores `data` under the subsection)
                _store(subsection, data)
            for analysis_type in analyses:
                result = run_analysis(data, analysis_type, sub_args)
                key = f"{subsection}_{analysis_type}"
                report.analyses[key] = result
                step["analyses"].append(analysis_type)
                if store:
                    if analysis_type in _REGULATION_ANALYSES:
                        reg = _regulated_subset(data, result, sub_args)
                        if reg is not None:
                            # fixed keys = reference parity (dataset.py:
                            # 254-261; last regulation analysis wins there
                            # too). The subsection-prefixed copies keep a
                            # config with SEVERAL regulation subsections
                            # from silently losing the earlier results.
                            _store("regulated", reg)
                            _store("regulation table", result)
                            _store(f"{subsection}_regulated", reg)
                            _store(f"{subsection}_regulation_table", result)
                    else:
                        _store(key, result)
            report.pipeline.append(step)
    return report
