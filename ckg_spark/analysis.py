"""Analysis dispatcher — the engine's twin of the reference's
``analytics_core/analytics_factory.py`` (Analysis class, :9-200):
a string-keyed dispatch from analysis-type + args dict to the
distributed operator, so report configs (the reference drives this from
YAML) can run unchanged against Spark frames.

Differences from the reference, by design:

- every dispatched operator is a DISTRIBUTED DataFrame plan (the
  reference collects to pandas/scipy); results come back as DataFrames.
- driver-side-only analyses (tsne, umap) are not dispatched —
  `SUPPORTED` is the contract. The reference's own factory silently
  no-ops unknown types; here unknown types raise. (WGCNA, SAMR and
  mapper, originally in this list, gained distributed stand-ins — see
  ``_wgcna``/ops/wgcna.py, ``_samr``/ops/stats.py::sam_permutation_fdr
  and ``_mapper``/ops/mapper.py.)

Data conventions per analysis type are documented in each handler;
long-format column names arrive via ``args`` exactly like the
reference's kwargs-from-YAML.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _summary(df: DataFrame, a: dict) -> DataFrame:
    from .ops import stats

    return stats.summary_stats(df, a.get("value_col", "value"), a.get("group_cols", []))


def _normalization(df: DataFrame, a: dict) -> DataFrame:
    from .ops import stats

    method = a.get("method", "median_polish")
    value = a.get("value_col", "value")
    v = F.col(value).cast("double")
    if method == "zscore":
        return stats.zscore(df, value, a.get("group_cols", []))
    if method == "median":
        # normalization_median (analytics.py:375-391): center on the
        # sample's exact median
        w = Window.partitionBy(a.get("sample_col", "sample"))
        return df.withColumn(
            "value_norm",
            F.round(v - F.expr(f"percentile(CAST({value} AS DOUBLE), 0.5)").over(w), 6),
        )
    if method == "l2":
        # zero-norm guard: an all-zero sample keeps its zeros (the raw
        # division throws DIVIDE_BY_ZERO under this session's ANSI config)
        w = Window.partitionBy(a.get("sample_col", "sample"))
        nrm = F.sqrt(F.sum(v * v).over(w))
        return df.withColumn(
            "value_norm", F.round(F.when(nrm > 0, v / nrm).otherwise(v), 6)
        )
    if method == "quantile":
        return stats.quantile_normalize(
            df, a.get("sample_col", "sample"), a.get("key_cols", ["identifier"]), value
        )
    if method == "median_polish":
        return stats.median_polish(
            df,
            a.get("row_col", "identifier"),
            a.get("sample_col", "sample"),
            value,
            sweeps=a.get("sweeps", 2),
        )
    raise ValueError(f"unknown normalization method {method!r}")


def _imputation(df: DataFrame, a: dict) -> DataFrame:
    from .ops import impute

    method = a.get("method", "group_median")
    value = a.get("value_col", "value")
    missing = a.get("is_missing", F.col(value).isNull())
    if method == "group_median":
        return impute.impute_group_median(df, a.get("group_cols", []), value, missing)
    if method == "downshift":
        return impute.impute_normal_downshift(
            df, a.get("group_cols", []), value, missing, shift=a.get("shift", 1.8)
        )
    if method == "knn":
        return impute.impute_knn(
            df,
            a.get("sample_col", "sample"),
            a.get("feature_col", "identifier"),
            value,
            missing,
            k=a.get("k", 5),
            block_col=a.get("block_col"),
        )
    if method == "mixed":
        # imputation_mixed_norm_KNN (analytics.py:268-291)
        return impute.impute_mixed(
            df,
            a.get("sample_col", "sample"),
            a.get("feature_col", "identifier"),
            value,
            missing,
            a.get("group_col", "group"),
            cutoff=a.get("cutoff", 0.6),
            shift=a.get("shift", 1.8),
            k=a.get("k", 3),
        )
    raise ValueError(f"unknown imputation method {method!r}")


def _pca(df: DataFrame, a: dict) -> DataFrame:
    from .ops.pca import pca_project

    projected, _comps, _ev = pca_project(
        df,
        a["feature_cols"],
        k=a.get("components", 2),
        id_cols=a.get("id_cols", []),
    )
    return projected


def _wide_format(df: DataFrame, a: dict) -> DataFrame:
    from .ops.reshape import wide_format

    return wide_format(
        df, a["index"], a["columns"], a["values"], extra=a.get("extra")
    )


def _long_format(df: DataFrame, a: dict) -> DataFrame:
    from .ops.reshape import long_format

    return long_format(
        df,
        a.get("drop_columns", []),
        a["group"],
        columns=tuple(a.get("columns", ("name", "y"))),
    )


def _ranking_with_markers(df: DataFrame, a: dict) -> DataFrame:
    from .ops.reshape import ranking_with_markers

    return ranking_with_markers(
        df,
        a["group"],
        a.get("name_col", "name"),
        a.get("value_col", "y"),
        a.get("list_markers", []),
        annotation=a.get("annotation"),
    )


def _cov(df: DataFrame, a: dict) -> DataFrame:
    from .ops.reshape import coefficient_of_variation

    return coefficient_of_variation(
        df,
        a["group"],
        a["name_col"],
        a["value_col"],
        unlog2=a.get("unlog2", True),
    )


def _anova_twoway(df: DataFrame, a: dict) -> DataFrame:
    from .ops.stats import anova_twoway

    return anova_twoway(
        df,
        a["factor_a"],
        a["factor_b"],
        a["value_col"],
        order_cols=a["order_cols"],
        balance=a.get("balance", True),
    )


def _rm_anova(df: DataFrame, a: dict) -> DataFrame:
    from .ops.stats import rm_anova

    return rm_anova(df, a["subject_col"], a["condition_col"], a["value_col"])


def _enrichment(df: DataFrame, a: dict) -> DataFrame:
    from pyspark.sql import functions as F

    from .ops.stats import fisher_enrichment

    return fisher_enrichment(df, a["term_col"], F.expr(a["foreground"]))


def _tsne(df: DataFrame, a: dict) -> DataFrame:
    from .ops.tsne import tsne_embed

    return tsne_embed(
        df,
        a["feature_cols"],
        id_cols=a.get("id_cols", []),
        components=a.get("components", 2),
        perplexity=a.get("perplexity", 40.0),
        n_iter=a.get("n_iter", 1000),
    )


def _umap(df: DataFrame, a: dict) -> DataFrame:
    from .ops.tsne import umap_embed

    return umap_embed(
        df,
        a["feature_cols"],
        id_cols=a.get("id_cols", []),
        components=a.get("components", 2),
        n_neighbors=a.get("n_neighbors", 10),
        min_dist=a.get("min_dist", 0.3),
        metric=a.get("metric", "cosine"),
    )


def _maybe_correct(r: DataFrame, a: dict) -> DataFrame:
    """Apply the requested p-value correction; 'none' skips, anything
    other than the supported methods RAISES — a typo'd correction name
    silently returning raw p-values is exactly the failure mode this
    dispatcher exists to prevent."""
    from .ops import stats

    correction = a.get("correction", "fdr_bh")
    if correction in (None, "none"):
        return r
    if correction == "fdr_bh":
        return stats.bh_adjust(
            r, "p_value", [a.get("feature_col", "identifier")], alpha=a.get("alpha", 0.05)
        )
    if correction == "fdr_tsbh":
        # apply_pvalue_twostage_fdrcorrection (analytics.py:905-921)
        return stats.bh_twostage(
            r, "p_value", [a.get("feature_col", "identifier")], alpha=a.get("alpha", 0.05)
        )
    if correction in ("bonferroni", "sidak", "holm"):
        # apply_pvalue_correction one-step / step-down family
        # (analytics.py:859-886)
        return stats.pvalue_correction(
            r,
            "p_value",
            [a.get("feature_col", "identifier")],
            alpha=a.get("alpha", 0.05),
            method=correction,
        )
    raise ValueError(
        f"unknown correction {correction!r} (supported: 'fdr_bh', 'fdr_tsbh', "
        "'bonferroni', 'sidak', 'holm', 'none')"
    )


def _ttest(df: DataFrame, a: dict) -> DataFrame:
    from .ops import stats

    if int(a.get("permutations", 0) or 0) > 0:
        # the reference routes ttest to SAMR when permutations>0
        # (analytics.py:1239-1260, R via rpy2); the scipy/R-free analog is
        # the deterministic label-permutation FDR (analytics.py:923-989)
        rid_col = a.get("rid_col")
        if not rid_col:
            raise ValueError(
                "ttest with permutations>0 needs 'rid_col' — a column "
                "uniquely identifying rows (the deterministic permutation "
                "keys on it)"
            )
        return stats.ttest_permutation_fdr(
            df,
            a.get("feature_col", "identifier"),
            a.get("group_col", "group"),
            a.get("value_col", "value"),
            a["group_a"],
            a["group_b"],
            rid_col=rid_col,
            permutations=int(a["permutations"]),
        )
    r = stats.welch_ttest(
        df,
        a.get("feature_col", "identifier"),
        a.get("group_col", "group"),
        a.get("value_col", "value"),
        a["group_a"],
        a["group_b"],
    )
    return _maybe_correct(r, a)


def _samr(df: DataFrame, a: dict) -> DataFrame:
    """run_samr proper (analytics.py:1792-1896, R 'samr' via rpy2): the
    SAM s0-shrunken statistic with automatic Tusher/Chu s0 selection on
    top of the deterministic permutation-FDR machinery. 's0' overrides
    the automatic selection (samr's s0= argument)."""
    from .ops import stats

    rid_col = a.get("rid_col")
    if not rid_col:
        raise ValueError(
            "samr needs 'rid_col' — a column uniquely identifying rows "
            "(the deterministic permutation keys on it)"
        )
    return stats.sam_permutation_fdr(
        df,
        a.get("feature_col", "identifier"),
        a.get("group_col", "group"),
        a.get("value_col", "value"),
        a["group_a"],
        a["group_b"],
        rid_col=rid_col,
        permutations=int(a.get("permutations", 20) or 20),
        s0=a.get("s0"),
    )


def _mapper(df: DataFrame, a: dict) -> DataFrame:
    """run_mapper (analytics.py:2171-2210, KeplerMapper): the Mapper
    nerve over explicit lens columns — cover assignment is pure column
    math, per-cube clustering (n_clusters>1) is the reference's
    complete-linkage/correlation agglomerative, run per cube via
    applyInPandas."""
    from .ops.mapper import mapper_nerve

    return mapper_nerve(
        df,
        a.get("id_col", "id"),
        a.get("feature_cols", []),
        a["lens_cols"],
        n_cubes=int(a.get("n_cubes", 15)),
        overlap=float(a.get("overlap", 0.5)),
        n_clusters=int(a.get("n_clusters", 3)),
    )


def _mannwhitney(df: DataFrame, a: dict) -> DataFrame:
    from .ops import stats

    r = stats.mann_whitney_u(
        df,
        a.get("feature_col", "identifier"),
        a.get("group_col", "group"),
        a.get("value_col", "value"),
        a["group_a"],
        a["group_b"],
    )
    return _maybe_correct(r, a)


def _correlation(df: DataFrame, a: dict) -> DataFrame:
    # calculate_correlations / run_correlation (analytics.py:839-858,
    # 1005-1043): per-group Pearson or Spearman of two measures, BH (or
    # any supported) correction over the per-group p-values
    from .ops import stats

    r = stats.correlation(
        df,
        a["x_col"],
        a["y_col"],
        a.get("group_cols", ["group"]),
        method=a.get("method", "pearson"),
    )
    if a.get("correction", "none") in (None, "none"):
        return r
    keys = a.get("group_cols", ["group"])
    c = dict(a)
    c["feature_col"] = keys[0] if keys else "n"
    return _maybe_correct(r, c)


def _levene(df: DataFrame, a: dict) -> DataFrame:
    from .ops import stats

    return stats.levene_bf(
        df,
        a.get("feature_col", "identifier"),
        a.get("group_col", "group"),
        a.get("value_col", "value"),
    )


def _effect_size(df: DataFrame, a: dict) -> DataFrame:
    from .ops import stats

    return stats.effect_sizes(
        df,
        a.get("feature_col", "identifier"),
        a.get("group_col", "group"),
        a.get("value_col", "value"),
        a["group_a"],
        a["group_b"],
    )


def _normality(df: DataFrame, a: dict) -> DataFrame:
    from .ops import stats

    return stats.normality_test(
        df,
        a.get("feature_col", "identifier"),
        a.get("group_col", "group"),
        a.get("value_col", "value"),
        alpha=a.get("alpha", 0.05),
    )


def _wilcoxon(df: DataFrame, a: dict) -> DataFrame:
    from .ops import stats

    r = stats.wilcoxon_signed_rank(
        df,
        a.get("feature_col", "identifier"),
        a.get("subject_col", "subject"),
        a.get("group_col", "group"),
        a.get("value_col", "value"),
        a["group_a"],
        a["group_b"],
    )
    return _maybe_correct(r, a)


def _anova(df: DataFrame, a: dict) -> DataFrame:
    from .ops import stats

    r = stats.anova_oneway(
        df,
        a.get("feature_col", "identifier"),
        a.get("group_col", "group"),
        a.get("value_col", "value"),
    )
    return _maybe_correct(r, a)


def _survival(df: DataFrame, a: dict) -> DataFrame:
    from .ops.survival import kaplan_meier

    return kaplan_meier(
        df,
        a.get("time_col", "duration"),
        F.col(a.get("event_col", "event")),
        a.get("group_cols", ["group"]),
    )


def _logrank(df: DataFrame, a: dict) -> DataFrame:
    from .ops.survival import logrank_statistic

    return logrank_statistic(
        df,
        a.get("time_col", "duration"),
        F.col(a.get("event_col", "event")),
        a.get("group_col", "group"),
    )


def _clustering(df: DataFrame, a: dict) -> DataFrame:
    from .ops.cluster import kmeans_assign

    return kmeans_assign(
        df,
        k=a.get("k", 10),
        iters=a.get("iters", 6),
        id_col=a.get("id_col", "id"),
        dim_col=a.get("dim_col", "dim"),
        val_col=a.get("val_col", "val"),
    )


def _communities(df: DataFrame, a: dict) -> DataFrame:
    from .ops.graph import label_propagation

    return label_propagation(
        df,
        src=a.get("src", "subj"),
        dst=a.get("dst", "obj"),
        iterations=a.get("iters", 10),
    )


def _pagerank(df: DataFrame, a: dict) -> DataFrame:
    from .ops.graph import pagerank

    return pagerank(
        df,
        src=a.get("src", "subj"),
        dst=a.get("dst", "obj"),
        damping=a.get("damping", 0.85),
        iterations=a.get("iters", 15),
    )


def _graph_summary(df: DataFrame, a: dict) -> DataFrame:
    from .ops.graph import graph_summary

    return graph_summary(df, src=a.get("src", "subj"), dst=a.get("dst", "obj"))


def _closeness(df: DataFrame, a: dict) -> DataFrame:
    from .ops.graph import closeness_centrality, closeness_centrality_sampled

    if a.get("sample_pivots"):
        # scale fallback: landmark estimation, topology never broadcast
        if a.get("weight"):
            # the sampled estimator is unweighted-only (distributed BFS);
            # silently returning hop-count closeness for a weighted
            # request would be wrong — refuse loudly
            raise ValueError(
                "closeness with sample_pivots is unweighted-only; drop "
                "'weight' (hop distances) or drop 'sample_pivots' (exact "
                "weighted closeness behind the broadcast gate)"
            )
        kwargs = {}
        if a.get("max_iterations"):
            kwargs["max_iterations"] = int(a["max_iterations"])
        return closeness_centrality_sampled(
            df,
            src=a.get("src", "subj"),
            dst=a.get("dst", "obj"),
            sample_pivots=int(a["sample_pivots"]),
            seed=int(a.get("seed", 13)),
            **kwargs,
        )
    return closeness_centrality(
        df,
        src=a.get("src", "subj"),
        dst=a.get("dst", "obj"),
        weight=a.get("weight"),
    )


def _triangles(df: DataFrame, a: dict) -> DataFrame:
    from .ops.graph import triangle_stats

    return triangle_stats(df, src=a.get("src", "subj"), dst=a.get("dst", "obj"))


def _kcore(df: DataFrame, a: dict) -> DataFrame:
    from .ops.graph import k_core

    return k_core(
        df,
        k=a.get("k", 2),
        src=a.get("src", "subj"),
        dst=a.get("dst", "obj"),
    )


def _wgcna(df: DataFrame, a: dict) -> DataFrame:
    """'wgcna' analysis type (analytics_factory.py:414-…): module
    detection over a LONG (sample, feature, value) frame — the
    distributed stand-in for the reference's rpy2 WGCNA::blockwiseModules
    walk. Returns (feature, module, module_size); eigengenes/trait
    correlation are separate calls on ops.wgcna (they need the modules
    frame plus trait data, like the reference's multi-step factory
    branch)."""
    from .ops import wgcna

    return wgcna.wgcna_modules(
        df,
        sample_col=a.get("sample_col", "sample"),
        feature_col=a.get("feature_col", "identifier"),
        value_col=a.get("value_col", "value"),
        power=a.get("power", 6),
        tom_cutoff=a.get("tom_cutoff", 0.1),
        min_module_size=a.get("min_module_size", 2),
        min_n=a.get("min_n", 3),
    )


def _thsd(df: DataFrame, a: dict) -> DataFrame:
    # calculate_THSD (analytics.py:1278-1298): k is structural — the
    # range-CDF power — so resolve it with one dimension-sized action
    # when the caller does not pass it
    from .ops import stats

    group_col = a.get("group_col", "group")
    k = a.get("k") or df.select(group_col).distinct().count()
    return stats.tukey_hsd(
        df,
        a.get("feature_col", "identifier"),
        group_col,
        a.get("value_col", "value"),
        k=k,
        alpha=a.get("alpha", 0.05),
        is_logged=a.get("is_logged", True),
    )


def _dabest(df: DataFrame, a: dict) -> DataFrame:
    # run_dabest / calculate_dabest (analytics.py:1348-1510): mean
    # difference + bootstrap percentile CI, as the deterministic
    # Poisson bootstrap
    from .ops import stats

    return stats.bootstrap_meandiff(
        df,
        a.get("feature_col", "identifier"),
        a.get("group_col", "group"),
        a.get("value_col", "value"),
        a.get("id_col", "subject"),
        a["group_a"],
        a["group_b"],
        n_boot=a.get("n_boot", 100),
        alpha=a.get("alpha", 0.05),
    )


def _eigenvector(df: DataFrame, a: dict) -> DataFrame:
    from .ops.graph import eigenvector_centrality

    return eigenvector_centrality(
        df,
        src=a.get("src", "src"),
        dst=a.get("dst", "dst"),
        weight=a.get("weight"),
        iters=a.get("iters", 12),
    )


def _correlation_matrix(df: DataFrame, a: dict) -> DataFrame:
    # run_correlation / run_efficient_correlation (analytics.py:1005-1043,
    # 1147-1176): ALL-PAIRS feature correlations from the long table,
    # t-tail p per pair, then the configured correction — output columns
    # (node1, node2, weight, p_value, p_adj, rejected) feed
    # convertToEdgeList/get_network exactly like the reference's
    from .ops import stats

    r = stats.feature_correlation_matrix(
        df,
        a.get("sample_col", "sample"),
        a.get("feature_col", "identifier"),
        a.get("value_col", "value"),
        method=a.get("method", "pearson"),
        min_n=a.get("min_n", 3),
    )
    if a.get("correction", "fdr_bh") in (None, "none"):
        return r
    c = dict(a)
    c.setdefault("correction", "fdr_bh")
    c["feature_col"] = "node1"
    # node1 alone as the ordering key: correction keeps all columns, and
    # ties in p get identical adjusted values regardless of tiebreak order
    return _maybe_correct(r, c)


def multi_correlation(frames: dict[str, DataFrame], args: dict | None = None) -> DataFrame:
    """run_multi_correlation (analytics.py:1044-1073): inner-merge the
    datasets on the sample key, then the all-pairs correlation matrix.
    Long-format spelling: features are tagged '<dtype>~<feature>' (the
    reference's merged wide frame keeps per-dataset column names), and
    the inner merge becomes 'keep samples present in EVERY frame' —
    broadcast semi-joins against each frame's dimension-sized sample
    set, then one union feeding :func:`_correlation_matrix`."""
    a = dict(args or {})
    sample_col = a.get("sample_col", "sample")
    feature_col = a.get("feature_col", "identifier")
    value_col = a.get("value_col", "value")
    if not frames:
        raise ValueError("multi_correlation: no frames")
    tagged = None
    common = None
    for dtype in frames:  # config/dict order, like the reference's loop
        f = frames[dtype].select(
            F.col(sample_col).alias("sample"),
            F.concat(F.lit(f"{dtype}~"), F.col(feature_col).cast("string")).alias(
                "identifier"
            ),
            F.col(value_col).cast("double").alias("value"),
        )
        tagged = f if tagged is None else tagged.unionByName(f)
        s = frames[dtype].select(F.col(sample_col).alias("sample")).distinct()
        common = s if common is None else common.join(F.broadcast(s), "sample", "left_semi")
    merged = tagged.join(F.broadcast(common), "sample", "left_semi")
    a.update({"sample_col": "sample", "feature_col": "identifier", "value_col": "value"})
    return _correlation_matrix(merged, a)


SUPPORTED: dict[str, Callable[[DataFrame, dict], DataFrame]] = {
    "summary": _summary,
    "normalization": _normalization,
    "imputation": _imputation,
    "pca": _pca,
    "ttest": _ttest,
    "samr": _samr,
    "mapper": _mapper,
    "correlation": _correlation,
    "correlation_matrix": _correlation_matrix,
    "mannwhitney": _mannwhitney,
    "wilcoxon": _wilcoxon,
    "normality": _normality,
    "levene": _levene,
    "effect_size": _effect_size,
    "anova": _anova,
    "dabest": _dabest,
    "thsd": _thsd,
    "survival": _survival,
    "logrank": _logrank,
    "clustering": _clustering,
    "communities": _communities,
    "pagerank": _pagerank,
    "eigenvector": _eigenvector,
    "closeness": _closeness,
    "graph_summary": _graph_summary,
    "triangles": _triangles,
    "kcore": _kcore,
    "wgcna": _wgcna,
    "tsne": _tsne,
    "umap": _umap,
    # the reference factory's literal type strings for these analyses
    # (analytics_factory.py:221,233,324) plus snake_case aliases
    "2-way anova": _anova_twoway,
    "anova_twoway": _anova_twoway,
    "repeated_measurements_anova": _rm_anova,
    "rm_anova": _rm_anova,
    "regulation_enrichment": _enrichment,
    "enrichment": _enrichment,
    # format transforms and plot-prep (analytics_factory.py:61,387,389,410)
    "wide_format": _wide_format,
    "long_format": _long_format,
    "ranking_with_markers": _ranking_with_markers,
    "coefficient_of_variation": _cov,
}


def run_analysis(df: DataFrame, analysis_type: str, args: dict | None = None) -> DataFrame:
    """Dispatch one analysis (≙ Analysis.generate_result,
    analytics_factory.py:60-200). Unknown types raise (the reference
    silently skips them — an error is kinder)."""
    if analysis_type not in SUPPORTED:
        raise ValueError(
            f"unsupported analysis_type {analysis_type!r}; supported: {sorted(SUPPORTED)}"
        )
    return SUPPORTED[analysis_type](df, args or {})


class Analysis:
    """API-shape twin of the reference's Analysis container
    (analytics_factory.py:9-58): identifier + type + args + data, with
    ``generate_result()`` populating ``self.result[analysis_type]``."""

    def __init__(
        self,
        identifier: str,
        analysis_type: str,
        args: dict[str, Any],
        data: DataFrame,
        result: dict | None = None,
    ):
        self.identifier = identifier
        self.analysis_type = analysis_type
        self.args = args
        self.data = data
        self.result = result if result is not None else {}

    def generate_result(self) -> dict:
        self.result[self.analysis_type] = run_analysis(
            self.data, self.analysis_type, self.args
        )
        return self.result
