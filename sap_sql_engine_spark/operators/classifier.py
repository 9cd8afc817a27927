"""On-engine trained classifiers — the fifth bounded-iteration family
member (after PageRank, Lloyd, BPE merges, LPA, power iteration): a
logistic-regression quality classifier trained by bounded full-batch
gradient steps entirely inside the engine, in integer-quantized micro
units, so the DuckDB oracle unrolls the exact training recurrence as CTEs
and the gate hashes TRAINING and EVALUATION as one composition.

The reference has no ML surface (its scope is NL->SQL over a semantic
model, reference ``sap_sql_engine.py``); this is the
training-data-pipeline counterpart the mandate adds: the fastText/logreg
style quality-classifier loop every corpus-curation pipeline runs
(featurize -> fit -> held-out eval -> threshold), expressed Spark-first.

Exactness recipe (the Lloyd/top-eigen conventions):

- features quantize ONCE to micro units (integers; truncating division,
  identical on both engines — Spark ``DIV`` and DuckDB ``//`` both
  truncate toward zero, measured for embedding_top_eigen);
- the link is the HARD sigmoid ``clamp(1/2 + z/4, 0, 1)`` — the standard
  quantization-exact surrogate (piecewise-linear, so every probability is
  an integer micro value and the recurrence is bit-replicable; a
  transcendental exp() would leave the orbit hostage to libm ulps);
- gradients accumulate in DECIMAL(38,0) (oracle: HUGEINT) and re-quantize
  to the micro grid per step, so both engines walk the identical orbit.

Honesty: on this synthetic corpus the label (``lang``) is INDEPENDENT of
the text (the generator assigns languages to spark-vocabulary documents
at random — measured: per-lang marker densities are flat), so the fitted
model converges to the majority-class predictor and held-out accuracy
sits near the base rate. That is the correct answer for this corpus and
the gate hashes it as-is — the same honest-numbers convention as the
near-zero single-probe LSH recall. The planted linearly-separable pytest
corpus proves the trainer learns (10000 bp) when signal exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..cachereg import cache_eager
from ..sources.loader import spread, table

LOGREG_M = 1_000_000  # micro-unit quantization (Lloyd/eigen convention)
LOGREG_ITERS = 6  # bounded full-batch gradient steps
LOGREG_LR = 4  # integer learning-rate multiplier
LOGREG_LEN_CAP = 200  # token-count feature saturates here
HELDOUT_MOD = 5  # doc_id % 5 == 0 -> held-out (deterministic split)

# the quality-signal feature set (quality_score_from's ingredients):
# stopword density, alphabetic ratio, capped length — plus the bias.
# Same regex text works verbatim in Java regex and DuckDB RE2.
_STOP_RE = r"\b(the|and|of|to|a|in|is|it)\b"


def _featurize(docs: DataFrame) -> DataFrame:
    """(doc_id, y, held, x0..x3) with every feature an exact BIGINT micro
    value: x0 = bias (1.0), x1 = stopword density, x2 = alpha ratio,
    x3 = capped token count. One narrow map over the scan."""
    t = F.trim(F.col("text"))
    base = docs.select(
        "doc_id",
        (F.col("lang") == "en").cast("bigint").alias("y"),
        (F.col("doc_id") % HELDOUT_MOD == 0).cast("int").alias("held"),
        F.regexp_count(F.lower(t), F.lit(_STOP_RE))
        .cast("bigint")
        .alias("stop"),
        F.length(F.regexp_replace(t, r"[^A-Za-z]", "")).cast("bigint").alias("alpha"),
        F.length(t).cast("bigint").alias("n_chars"),
        F.size(F.split(t, r"\s+")).cast("bigint").alias("toks"),
    )
    m = LOGREG_M
    return base.selectExpr(
        "doc_id",
        "y",
        "held",
        f"CAST({m} AS BIGINT) AS x0",
        f"stop * {m} DIV toks AS x1",
        f"alpha * {m} DIV greatest(n_chars, 1) AS x2",
        f"least(toks, {LOGREG_LEN_CAP}) * {m} DIV {LOGREG_LEN_CAP} AS x3",
    )


_Z_EXPR = f"(w0*x0 + w1*x1 + w2*x2 + w3*x3) DIV {LOGREG_M}"


def _fit(docs: DataFrame):
    """Featurize + train: returns ``(feats, w)`` — the cached feature
    relation and the fitted 1-row weight vector (w0..w3) — the shared
    trunk of the report, the threshold sweep, and the streaming scorer.

    Recurrence per step (all integer): z = (w.x) DIV M; p = clamp(M/2 +
    z DIV 4, 0, M); err = p - y*M; g_j = sum(err * x_j) DIV (n_train*M)
    in DECIMAL(38,0); w_j -= LR * g_j.

    Scale shape: ONE cached featurize pass; each of the 6 bounded steps
    is one map-side-combined aggregation over the cached training
    relation with the 1-row weight vector broadcast onto it (the Lloyd
    round shape — BNLJ_ALLOWED bounded probe). At 100 TB the per-step
    aggregation collapses further by grouping on the quantized feature
    vector (sufficient statistics bounded by the feature grid), exactly
    as the oracle's `train` relation would."""
    m = LOGREG_M
    feats = cache_eager(_featurize(docs))
    return _fit_on(feats, docs.sparkSession)


def _fit_on(feats: DataFrame, spark: SparkSession, mask=(1, 1, 1, 1)):
    """Training loop over an already-cached feature relation. ``mask``
    zeroes ablated feature columns (x_j * 0 => that weight's gradient is
    identically 0 and z never sees the feature — exactly dropping it),
    which is how logreg_ablation_report trains the drop-one variants off
    ONE shared featurize pass."""
    m = LOGREG_M
    if mask != (1, 1, 1, 1):
        feats = feats.selectExpr(
            "doc_id",
            "y",
            "held",
            *[f"CAST(x{j} * {mask[j]} AS BIGINT) AS x{j}" for j in range(4)],
        )
    train = feats.filter(F.col("held") == 0)
    n_train = train.count()  # driver scalar probe (bm25/tfidf convention)
    z_expr = _Z_EXPR
    # Driver-side weight recurrence (r15, the kmeans-centroid pattern):
    # the per-step state is FOUR integers. Feed them into each gradient
    # step as LITERALS and collect the 1-row update — one job per step,
    # no broadcast build of the previous weight relation, no
    # localCheckpoint job or pinned storage (the r14 shape), and every
    # consumer plans against a constant-size local relation. The integer
    # recurrence is expression-identical.
    wvals = [0, 0, 0, 0]
    w_schema = ", ".join(f"w{j} BIGINT" for j in range(4))
    for _ in range(LOGREG_ITERS):
        scored = train.selectExpr(
            *[f"CAST({wvals[j]} AS BIGINT) AS w{j}" for j in range(4)],
            "x0",
            "x1",
            "x2",
            "x3",
            f"least(greatest({m // 2} + ({z_expr}) DIV 4, 0), {m})"
            f" - y * {m} AS err",
        )
        rows = (
            scored.groupBy("w0", "w1", "w2", "w3")
            .agg(
                *[
                    F.expr(f"sum(CAST(err AS DECIMAL(38,0)) * x{j})").alias(
                        f"g{j}"
                    )
                    for j in range(4)
                ]
            )
            .selectExpr(
                *[
                    f"CAST(w{j} - {LOGREG_LR} * CAST(g{j} DIV {n_train * m}"
                    f" AS BIGINT) AS BIGINT) AS w{j}"
                    for j in range(4)
                ]
            )
            .collect()
        )
        if not rows:  # empty training split: the old loop's empty relation
            return feats, spark.createDataFrame([], w_schema)
        wvals = [int(rows[0][f"w{j}"]) for j in range(4)]
    w = spark.createDataFrame([tuple(wvals)], w_schema)
    return feats, w


def logreg_fit_report(docs: DataFrame) -> DataFrame:
    """Train (see :func:`_fit`) and emit a 1-row report: split sizes, the
    fitted weights (micro units), and train/held-out accuracy in basis
    points. Prediction = (w.x) DIV M > 0; the final scoring pass is one
    aggregation over the weight-attached feature relation."""
    feats, w = _fit(docs)
    scored_all = feats.crossJoin(F.broadcast(w)).selectExpr(
        "w0",
        "w1",
        "w2",
        "w3",
        "held",
        "y",
        f"CASE WHEN {_Z_EXPR} > 0 THEN 1 ELSE 0 END AS pred",
    )
    return (
        scored_all.groupBy("w0", "w1", "w2", "w3")
        .agg(
            F.expr("sum(CASE WHEN held = 0 THEN 1 ELSE 0 END)").alias("ntr"),
            F.expr("sum(CASE WHEN held = 1 THEN 1 ELSE 0 END)").alias("nhe"),
            F.expr(
                "sum(CASE WHEN held = 0 AND pred = y THEN 1 ELSE 0 END)"
            ).alias("htr"),
            F.expr(
                "sum(CASE WHEN held = 1 AND pred = y THEN 1 ELSE 0 END)"
            ).alias("hhe"),
        )
        .selectExpr(
            "CAST(ntr AS BIGINT) AS n_train",
            "CAST(nhe AS BIGINT) AS n_heldout",
            "CAST(w0 AS BIGINT) AS w_bias",
            "CAST(w1 AS BIGINT) AS w_stop",
            "CAST(w2 AS BIGINT) AS w_alpha",
            "CAST(w3 AS BIGINT) AS w_len",
            "CAST(htr * 10000 DIV ntr AS BIGINT) AS train_acc_bp",
            "CAST(hhe * 10000 DIV nhe AS BIGINT) AS heldout_acc_bp",
        )
    )


def q_logreg_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """On-engine logistic-regression quality classifier over the
    documents table (target: lang == 'en' from the quality-signal
    features) — training recurrence + held-out evaluation in one gated
    composition. See module docstring for the honesty note: on this
    corpus the label carries no text signal, so the report correctly
    shows majority-class behavior."""
    return logreg_fit_report(spread(table(spark, sf_dir, "documents")))


# decision thresholds swept over the held-out margin z (micro units);
# tau = 0 is the report's operating point
LOGREG_THRESHOLDS = (-200_000, -100_000, -50_000, 0, 50_000, 100_000)


def logreg_threshold_sweep(docs: DataFrame) -> DataFrame:
    """Operating-point selection for the trained classifier: per decision
    threshold tau, held-out confusion counts and precision/recall (bp) —
    the curve a curation pipeline reads to pick its keep/drop cut. A tau
    with zero predicted positives reports the precision sentinel -1
    (undefined, kept non-null BIGINT); recall's denominator is the
    held-out positive count (>= 1 on any corpus with a positive class).

    Scale shape: the :func:`_fit` trunk plus ONE scoring aggregation —
    the |thresholds|-way fan-out is a literal explode on the scored rows
    (map-side), grouped into |thresholds| rows."""
    taus = ", ".join(str(t) for t in LOGREG_THRESHOLDS)
    feats, w = _fit(docs)
    scored = (
        feats.crossJoin(F.broadcast(w))
        .filter(F.col("held") == 1)
        .selectExpr("y", f"{_Z_EXPR} AS z")
        .selectExpr("y", "z", f"explode(array({taus})) AS thr_micro")
    )
    return (
        scored.groupBy("thr_micro")
        .agg(
            F.expr("sum(CASE WHEN z > thr_micro THEN 1 ELSE 0 END)").alias(
                "npp"
            ),
            F.expr(
                "sum(CASE WHEN z > thr_micro AND y = 1 THEN 1 ELSE 0 END)"
            ).alias("tp"),
            F.expr("sum(y)").alias("pos"),
        )
        .selectExpr(
            "CAST(thr_micro AS BIGINT) AS thr_micro",
            "CAST(npp AS BIGINT) AS n_pred_pos",
            "CAST(tp AS BIGINT) AS tp",
            "CAST(coalesce(tp * 10000 DIV nullif(npp, 0), -1) AS BIGINT)"
            " AS precision_bp",
            "CAST(tp * 10000 DIV greatest(pos, 1) AS BIGINT) AS recall_bp",
        )
        .orderBy("thr_micro")
    )


def q_logreg_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall operating points of the on-engine classifier over
    the documents corpus (train + sweep in one gated composition)."""
    return logreg_threshold_sweep(spread(table(spark, sf_dir, "documents")))


# drop-one-feature ablations (the bias x0 is never ablated)
LOGREG_ABLATIONS = (
    ("full", (1, 1, 1, 1)),
    ("no_stop", (1, 0, 1, 1)),
    ("no_alpha", (1, 1, 0, 1)),
    ("no_len", (1, 1, 1, 0)),
)


def logreg_ablation_report(docs: DataFrame) -> DataFrame:
    """Drop-one-feature ablation — the dashboard docs_feature_matrix's
    docstring promises: train the full model and each 3-feature variant
    (feature zeroed, so its gradient and contribution to z are
    identically 0) off ONE shared featurize pass, and report held-out
    accuracy per variant with the delta vs the full model. The feature
    whose removal costs the most accuracy is the one carrying the
    signal (the planted test drops the separating feature and watches
    accuracy collapse; on the gated corpus all deltas are honestly ~0
    because no feature carries lang signal).

    Scale shape: one cached featurize pass; each ablation is the
    bounded _fit_on recurrence (Lloyd-round class); leg accuracies are
    tagged 1-row aggregates UNIONed and folded with a bounded window."""
    spark = docs.sparkSession
    base = cache_eager(_featurize(docs))
    legs = []
    hit = (
        f"CASE WHEN (CASE WHEN ({_Z_EXPR}) > 0 THEN 1 ELSE 0 END) = y"
        " THEN 1 ELSE 0 END"
    )
    for name, mask in LOGREG_ABLATIONS:
        feats, w = _fit_on(base, spark, mask=mask)
        legs.append(
            feats.crossJoin(F.broadcast(w))
            .filter(F.col("held") == 1)
            .agg(
                F.expr(f"sum({hit})").alias("hits"),
                F.count(F.lit(1)).alias("n"),
            )
            .selectExpr(
                f"'{name}' AS ablation",
                "CAST(hits * 10000 DIV n AS BIGINT) AS heldout_acc_bp",
            )
        )
    allr = legs[0]
    for leg in legs[1:]:
        allr = allr.unionByName(leg)
    from pyspark.sql import Window

    w_all = Window.partitionBy()  # 4-row ablation relation
    return (
        allr.withColumn(
            "full_acc",
            F.expr(
                "max(CASE WHEN ablation = 'full' THEN heldout_acc_bp END)"
            ).over(w_all),
        )
        .selectExpr(
            "ablation",
            "heldout_acc_bp",
            "CAST(heldout_acc_bp - full_acc AS BIGINT) AS delta_bp",
        )
        .orderBy("ablation")
    )


def q_logreg_ablation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-ablation accuracy deltas of the on-engine classifier."""
    return logreg_ablation_report(spread(table(spark, sf_dir, "documents")))


CALIB_BINS = 5  # reliability-diagram probability bins over [0, 1]


def logreg_calibration_curve(docs: DataFrame) -> DataFrame:
    """Reliability diagram of the trained classifier on the held-out
    split: predicted probabilities (the hard-sigmoid p, exact micro
    integers) bucketed into CALIB_BINS equal bins, per bin the count,
    mean predicted probability (micro) and the empirical positive rate
    (bp). A calibrated model tracks the diagonal (mean_p ~ pos_rate);
    the gap column is the signed miscalibration. Bins a saturated model
    never emits are absent (honest sparse rows, like every histogram
    here).

    Scale shape: the shared _fit trunk + ONE scoring aggregation into
    <= CALIB_BINS groups."""
    m = LOGREG_M
    feats, w = _fit(docs)
    p = f"least(greatest({m // 2} + ({_Z_EXPR}) DIV 4, 0), {m})"
    scored = (
        feats.crossJoin(F.broadcast(w))
        .filter(F.col("held") == 1)
        .selectExpr("y", f"{p} AS p_micro")
        .selectExpr(
            "y",
            "p_micro",
            # p = 1.0 lands in the top bin, not a phantom bin CALIB_BINS
            f"least(CAST(p_micro * {CALIB_BINS} DIV {m} AS INT),"
            f" {CALIB_BINS - 1}) AS bin",
        )
    )
    return (
        scored.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.expr("sum(p_micro)").alias("sp"),
            F.expr("sum(y)").alias("pos"),
        )
        .selectExpr(
            "CAST(bin AS INT) AS bin",
            "n",
            "CAST(sp DIV n AS BIGINT) AS mean_p_micro",
            "CAST(pos * 10000 DIV n AS BIGINT) AS pos_rate_bp",
            # signed gap in bp: predicted (micro -> bp) minus empirical
            "CAST(sp DIV n DIV 100 - pos * 10000 DIV n AS BIGINT)"
            " AS calibration_gap_bp",
        )
        .orderBy("bin")
    )


def q_logreg_calibration_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out reliability diagram of the on-engine classifier."""
    return logreg_calibration_curve(spread(table(spark, sf_dir, "documents")))


# k-fold cross-validation: the report/ablation legs all reuse ONE fixed
# held-out fifth; CV rotates the evaluation fold so every doc is scored
# by a model that never saw it — the variance estimate (spread across
# folds) is what tells you whether the single held-out number is luck.

CV_FOLDS = 3


def logreg_cv_report(docs: DataFrame) -> DataFrame:
    """Per fold (doc_id % CV_FOLDS): eval-row count and accuracy of the
    model trained on the OTHER folds, plus the cross-fold mean and
    max-min spread (both bp, attached to every row so the relation is
    self-contained). A small spread = the classifier's quality estimate
    is stable under resampling; the honesty note in the module docstring
    applies (majority-class behavior on this corpus, so all folds sit
    near the base rate — which IS the stable answer).

    Scale shape (r12 rewrite, the verdict's one-agg-per-step item): ONE
    cached featurize pass tagged with fold ids; ALL folds train
    simultaneously — the CV_FOLDS-row weight relation broadcasts onto
    the feature relation (each row scores against the CV_FOLDS-1 models
    whose training set contains it) and each gradient step is ONE
    map-side-combined aggregation grouped by fold, so the serialized
    job count is LOGREG_ITERS + 2 instead of CV_FOLDS * (ITERS + 2)
    (6.24s -> ~1s at sf0.1). Per-fold math is unchanged from _fit_on
    (same integer recurrence, n_train folded into the same aggregation
    as count(*)), so the report values are identical; mean/spread
    windows run on the CV_FOLDS-row relation."""
    spark = docs.sparkSession
    m = LOGREG_M
    base = cache_eager(
        _featurize(docs).selectExpr(
            "doc_id",
            "y",
            f"CAST(doc_id % {CV_FOLDS} AS INT) AS fold",
            "x0",
            "x1",
            "x2",
            "x3",
        )
    )
    # Driver-side fold-weight recurrence (r15, the _fit_on pattern): the
    # per-step state is CV_FOLDS rows of four integers. Each step
    # explodes a LITERAL array of (fold_k, w0..w3) structs onto the
    # cached feature relation — the same row multiplication the
    # crossJoin(broadcast(w)) paid, minus the broadcast-build job — and
    # collects the CV_FOLDS-row update. Identical integer recurrence,
    # one job per step, no checkpoint storage.
    wrows = [(k, 0, 0, 0, 0) for k in range(CV_FOLDS)]
    w_schema = "fold_k INT, " + ", ".join(f"w{j} BIGINT" for j in range(4))
    for _ in range(LOGREG_ITERS):
        wlit = F.array(
            *[
                F.struct(
                    F.lit(int(r[0])).cast("int").alias("fold_k"),
                    *[
                        F.lit(int(r[1 + j])).cast("bigint").alias(f"w{j}")
                        for j in range(4)
                    ],
                )
                for r in sorted(wrows)
            ]
        )
        scored = (
            base.select("*", F.explode(wlit).alias("ws"))
            .select("fold", "y", "x0", "x1", "x2", "x3", "ws.*")
            .filter("fold != fold_k")
            .selectExpr(
                "fold_k",
                "w0",
                "w1",
                "w2",
                "w3",
                "x0",
                "x1",
                "x2",
                "x3",
                f"least(greatest({m // 2} + ({_Z_EXPR}) DIV 4, 0), {m})"
                f" - y * {m} AS err",
            )
        )
        wrows = [
            (
                int(r["fold_k"]),
                *[int(r[f"w{j}"]) for j in range(4)],
            )
            for r in scored.groupBy("fold_k", "w0", "w1", "w2", "w3")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                *[
                    F.expr(f"sum(CAST(err AS DECIMAL(38,0)) * x{j})").alias(
                        f"g{j}"
                    )
                    for j in range(4)
                ],
            )
            .selectExpr(
                "fold_k",
                *[
                    f"CAST(w{j} - {LOGREG_LR} * CAST(g{j} DIV (n * {m})"
                    f" AS BIGINT) AS BIGINT) AS w{j}"
                    for j in range(4)
                ],
            )
            .collect()
        ]
        if not wrows:  # no fold trains: the old loop's empty relation
            break
    w = spark.createDataFrame(sorted(wrows), w_schema)
    hit = (
        f"CASE WHEN (CASE WHEN ({_Z_EXPR}) > 0 THEN 1 ELSE 0 END) = y"
        " THEN 1 ELSE 0 END"
    )
    allr = (
        base.crossJoin(F.broadcast(w))
        .filter("fold = fold_k")
        .groupBy("fold_k")
        .agg(
            F.expr(f"sum({hit})").alias("hits"),
            F.count(F.lit(1)).alias("n"),
        )
        .selectExpr(
            "CAST(fold_k AS BIGINT) AS fold",
            "CAST(n AS BIGINT) AS n_eval",
            "CAST(hits * 10000 DIV n AS BIGINT) AS fold_acc_bp",
        )
    )
    # constant-key windows over the CV_FOLDS-row relation only
    return allr.selectExpr(
        "fold",
        "n_eval",
        "fold_acc_bp",
        f"CAST(sum(fold_acc_bp) OVER () DIV {CV_FOLDS} AS BIGINT)"
        " AS mean_acc_bp",
        "CAST(max(fold_acc_bp) OVER () - min(fold_acc_bp) OVER () AS BIGINT)"
        " AS spread_bp",
    ).orderBy("fold")


def q_logreg_cv_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-fold cross-validated accuracy of the on-engine classifier."""
    return logreg_cv_report(spread(table(spark, sf_dir, "documents")))


def streaming_logreg_score(spark: SparkSession, sf_dir: str, drop_dir: str, out_dir: str):
    """Train-offline / serve-online: the corpus trains the weights ONCE
    batch-side (:func:`_fit`, the gated recurrence), then JSONL document
    drops are featurized and scored per micro-batch with the broadcast
    1-row weight vector via ``foreachBatch`` appends — the
    streaming_ann_probe production split, on the classifier. The twin
    test asserts stream scores == batch scores on the same rows.

    Scale posture: the model is a 4-number relation (broadcast is free);
    each micro-batch pays exactly one featurize map + one broadcast
    attach — latency independent of corpus size."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from ..sources.ingest import CORRUPT_COL, stream_jsonl

    _feats, w = _fit(spread(table(spark, sf_dir, "documents")))
    wrow = cache_eager(w)
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
        ]
    )
    stream = (
        stream_jsonl(spark, drop_dir, schema)
        .filter(F.col(CORRUPT_COL).isNull())
        .drop(CORRUPT_COL)
    )

    def score(batch_df, _epoch):
        if batch_df.isEmpty():
            return
        batch_scores(batch_df, wrow).write.mode("append").parquet(out_dir)

    return stream.writeStream.foreachBatch(score).start()


def batch_scores(docs: DataFrame, w: DataFrame) -> DataFrame:
    """(doc_id, z_micro, pred) under an already-fitted weight relation —
    the serving unit shared by the streaming scorer and its batch twin."""
    return (
        _featurize(docs)
        .crossJoin(F.broadcast(w))
        .selectExpr(
            "doc_id",
            f"CAST({_Z_EXPR} AS BIGINT) AS z_micro",
            f"CAST(CASE WHEN {_Z_EXPR} > 0 THEN 1 ELSE 0 END AS INT) AS pred",
        )
    )


def _oracle_feats_cte() -> str:
    m = LOGREG_M
    return rf"""feats AS (
  SELECT doc_id,
         CAST(lang = 'en' AS BIGINT) AS y,
         CAST(doc_id % {HELDOUT_MOD} = 0 AS INT) AS held,
         CAST({m} AS BIGINT) AS x0,
         CAST(len(regexp_extract_all(lower(trim(text)), '{_STOP_RE}'))
              * {m} // len(regexp_split_to_array(trim(text), '\s+'))
              AS BIGINT) AS x1,
         CAST(length(regexp_replace(trim(text), '[^A-Za-z]', '', 'g'))
              * {m} // greatest(length(trim(text)), 1) AS BIGINT) AS x2,
         CAST(least(len(regexp_split_to_array(trim(text), '\s+')),
                    {LOGREG_LEN_CAP}) * {m} // {LOGREG_LEN_CAP}
              AS BIGINT) AS x3
  FROM documents
)"""


def _oracle_fit_ctes() -> str:
    ctes = [
        _oracle_feats_cte(),
        "train AS (SELECT * FROM feats WHERE held = 0)",
        "n AS (SELECT count(*) AS n_train FROM train)",
        "w0_ AS (SELECT "
        + ", ".join(f"CAST(0 AS BIGINT) AS w{j}" for j in range(4))
        + ")",
    ]
    ctes.extend(_oracle_steps("train", ""))
    return "WITH " + ",\n".join(ctes)


def _oracle_steps(train_rel: str, pfx: str, n_rel: str = "n") -> list:
    """The unrolled gradient-step CTEs over ``train_rel`` with CTE names
    prefixed (``w{it}{pfx}_`` etc.) — shared by the single-model oracles
    (pfx='', names unchanged), the per-ablation chains, and the CV folds
    (which pass their own ``n_rel`` because each fold's train count
    differs). Note the w0 seed is emitted by _oracle_fit_ctes for pfx=''
    and by the ablation/CV builders otherwise."""
    m = LOGREG_M
    z = f"(w.w0*t.x0 + w.w1*t.x1 + w.w2*t.x2 + w.w3*t.x3) // {m}"
    out = []
    for it in range(1, LOGREG_ITERS + 1):
        grads = ", ".join(
            f"CAST(w{j} - {LOGREG_LR} * CAST(sum(CAST(err AS HUGEINT) * x{j})"
            f" // ((SELECT n_train FROM {n_rel}) * {m}) AS BIGINT) AS BIGINT) AS w{j}"
            for j in range(4)
        )
        out.append(
            f"""s{it}{pfx} AS (
  SELECT w.w0, w.w1, w.w2, w.w3, t.x0, t.x1, t.x2, t.x3,
         least(greatest({m // 2} + ({z}) // 4, 0), {m}) - t.y * {m} AS err
  FROM {train_rel} t, w{it - 1}{pfx}_ w
),
w{it}{pfx}_ AS (
  SELECT {grads} FROM s{it}{pfx} GROUP BY w0, w1, w2, w3
)"""
        )
    return out


_ORACLE_ZF = (
    f"(w.w0*f.x0 + w.w1*f.x1 + w.w2*f.x2 + w.w3*f.x3) // {LOGREG_M}"
)


def _oracle_logreg() -> str:
    return (
        _oracle_fit_ctes()
        + f""",
scored AS (
  SELECT w.w0, w.w1, w.w2, w.w3, f.held, f.y,
         CASE WHEN {_ORACLE_ZF} > 0 THEN 1 ELSE 0 END AS pred
  FROM feats f, w{LOGREG_ITERS}_ w
)
SELECT CAST(sum(CASE WHEN held = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
       CAST(sum(CASE WHEN held = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_heldout,
       CAST(w0 AS BIGINT) AS w_bias,
       CAST(w1 AS BIGINT) AS w_stop,
       CAST(w2 AS BIGINT) AS w_alpha,
       CAST(w3 AS BIGINT) AS w_len,
       CAST(sum(CASE WHEN held = 0 AND pred = y THEN 1 ELSE 0 END) * 10000
            // sum(CASE WHEN held = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS train_acc_bp,
       CAST(sum(CASE WHEN held = 1 AND pred = y THEN 1 ELSE 0 END) * 10000
            // sum(CASE WHEN held = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS heldout_acc_bp
FROM scored
GROUP BY w0, w1, w2, w3
"""
    )


ORACLE_LOGREG_QUALITY = _oracle_logreg()


def _oracle_threshold_sweep() -> str:
    taus = ", ".join(f"({t})" for t in LOGREG_THRESHOLDS)
    return (
        _oracle_fit_ctes()
        + f""",
scored AS (
  SELECT f.y, {_ORACLE_ZF} AS z
  FROM feats f, w{LOGREG_ITERS}_ w
  WHERE f.held = 1
),
fan AS (
  SELECT s.y, s.z, t.thr_micro
  FROM scored s CROSS JOIN (VALUES {taus}) t(thr_micro)
)
SELECT CAST(thr_micro AS BIGINT) AS thr_micro,
       CAST(sum(CASE WHEN z > thr_micro THEN 1 ELSE 0 END) AS BIGINT)
         AS n_pred_pos,
       CAST(sum(CASE WHEN z > thr_micro AND y = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS tp,
       CAST(coalesce(sum(CASE WHEN z > thr_micro AND y = 1 THEN 1 ELSE 0 END)
                     * 10000
                     // nullif(sum(CASE WHEN z > thr_micro THEN 1 ELSE 0 END),
                               0), -1) AS BIGINT) AS precision_bp,
       CAST(sum(CASE WHEN z > thr_micro AND y = 1 THEN 1 ELSE 0 END) * 10000
            // greatest(sum(y), 1) AS BIGINT) AS recall_bp
FROM fan
GROUP BY thr_micro
ORDER BY thr_micro
"""
    )


ORACLE_LOGREG_THRESHOLD_SWEEP = _oracle_threshold_sweep()


def _oracle_ablation() -> str:
    ctes = [_oracle_feats_cte()]
    ctes.append("train AS (SELECT * FROM feats WHERE held = 0)")
    ctes.append("n AS (SELECT count(*) AS n_train FROM train)")
    accs = []
    for name, mask in LOGREG_ABLATIONS:
        pfx = f"_{name}"
        ctes.append(
            f"""f{pfx} AS (
  SELECT doc_id, y, held,
         {", ".join(f"CAST(x{j} * {mask[j]} AS BIGINT) AS x{j}" for j in range(4))}
  FROM feats
)"""
        )
        ctes.append(f"t{pfx} AS (SELECT * FROM f{pfx} WHERE held = 0)")
        ctes.append(
            f"w0{pfx}_ AS (SELECT "
            + ", ".join(f"CAST(0 AS BIGINT) AS w{j}" for j in range(4))
            + ")"
        )
        ctes.extend(_oracle_steps(f"t{pfx}", pfx))
        zf = (
            f"(w.w0*f.x0 + w.w1*f.x1 + w.w2*f.x2 + w.w3*f.x3) // {LOGREG_M}"
        )
        ctes.append(
            f"""acc{pfx} AS (
  SELECT '{name}' AS ablation,
         CAST(sum(CASE WHEN (CASE WHEN {zf} > 0 THEN 1 ELSE 0 END) = f.y
                       THEN 1 ELSE 0 END) * 10000 // count(*) AS BIGINT)
           AS heldout_acc_bp
  FROM f{pfx} f, w{LOGREG_ITERS}{pfx}_ w
  WHERE f.held = 1
)"""
        )
        accs.append(f"SELECT * FROM acc{pfx}")
    union = "\nUNION ALL ".join(accs)
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT ablation, heldout_acc_bp,
       CAST(heldout_acc_bp
            - max(CASE WHEN ablation = 'full' THEN heldout_acc_bp END)
              OVER () AS BIGINT) AS delta_bp
FROM ({union})
ORDER BY ablation
"""
    )


ORACLE_LOGREG_ABLATION = _oracle_ablation()


def _oracle_calibration() -> str:
    m = LOGREG_M
    zf = _ORACLE_ZF
    p = f"least(greatest({m // 2} + ({zf}) // 4, 0), {m})"
    return (
        _oracle_fit_ctes()
        + f""",
scored AS (
  SELECT f.y, {p} AS p_micro
  FROM feats f, w{LOGREG_ITERS}_ w
  WHERE f.held = 1
),
binned AS (
  SELECT y, p_micro,
         least(CAST(p_micro * {CALIB_BINS} // {m} AS INT), {CALIB_BINS - 1}) AS bin
  FROM scored
)
SELECT CAST(bin AS INT) AS bin,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(p_micro) // count(*) AS BIGINT) AS mean_p_micro,
       CAST(sum(y) * 10000 // count(*) AS BIGINT) AS pos_rate_bp,
       CAST(sum(p_micro) // count(*) // 100
            - sum(y) * 10000 // count(*) AS BIGINT) AS calibration_gap_bp
FROM binned
GROUP BY bin
ORDER BY bin
"""
    )


ORACLE_LOGREG_CALIBRATION = _oracle_calibration()


def _oracle_cv() -> str:
    ctes = [_oracle_feats_cte()]
    accs = []
    for k in range(CV_FOLDS):
        pfx = f"_cv{k}"
        ctes.append(
            f"t{pfx} AS (SELECT * FROM feats WHERE doc_id % {CV_FOLDS} != {k})"
        )
        ctes.append(f"n{pfx} AS (SELECT count(*) AS n_train FROM t{pfx})")
        ctes.append(
            f"w0{pfx}_ AS (SELECT "
            + ", ".join(f"CAST(0 AS BIGINT) AS w{j}" for j in range(4))
            + ")"
        )
        ctes.extend(_oracle_steps(f"t{pfx}", pfx, n_rel=f"n{pfx}"))
        zf = f"(w.w0*f.x0 + w.w1*f.x1 + w.w2*f.x2 + w.w3*f.x3) // {LOGREG_M}"
        ctes.append(
            f"""acc{pfx} AS (
  SELECT CAST({k} AS BIGINT) AS fold,
         CAST(count(*) AS BIGINT) AS n_eval,
         CAST(sum(CASE WHEN (CASE WHEN {zf} > 0 THEN 1 ELSE 0 END) = f.y
                       THEN 1 ELSE 0 END) * 10000 // count(*) AS BIGINT)
           AS fold_acc_bp
  FROM feats f, w{LOGREG_ITERS}{pfx}_ w
  WHERE f.doc_id % {CV_FOLDS} = {k}
)"""
        )
        accs.append(f"SELECT * FROM acc{pfx}")
    union = "\nUNION ALL ".join(accs)
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT fold, n_eval, fold_acc_bp,
       CAST(sum(fold_acc_bp) OVER () // {CV_FOLDS} AS BIGINT) AS mean_acc_bp,
       CAST(max(fold_acc_bp) OVER () - min(fold_acc_bp) OVER () AS BIGINT)
         AS spread_bp
FROM ({union})
ORDER BY fold
"""
    )


ORACLE_LOGREG_CV = _oracle_cv()


# ---------------------------------------------------------------------------
# AdaBoost over decision stumps — the ensemble member of the classifier
# family, and the sixth bounded-iteration family member. The discrete
# AdaBoost loop stays ALL-integer by using the rational-reweighting
# form: round weights are exact integers (DECIMAL(38,0) / HUGEINT),
# the weighted error is an exact fraction e/d, and the update multiplies
# correctly-classified weights by e and misclassified by (d - e) —
# the Freund-Schapire beta = e/(d-e) update cleared of its denominator,
# so both engines walk the identical orbit with no exp()/ln() anywhere.
# The reported ensemble is the UNIFORM-vote majority of the ADA_ROUNDS
# stumps (a weighted vote needs ln-alphas — transcendental; the uniform
# vote keeps the whole report FLOATS.md class D and is standard for
# equal-ish round errors). Weight magnitudes are bounded by
# n^(2^ROUNDS+...) < n^7; for n <= ~2e5 train rows that sits inside
# DECIMAL(38,0) — beyond that, renormalize per round with the same
# truncating DIV on both engines (documented knob, not needed at gate
# scales).

ADA_ROUNDS = 3
ADA_THR_STEP = 100_000  # candidate thresholds: 0.1..0.9 in micro units
ADA_N_THR = 9


def _ada_h(feat: int, thr: int, pol: int) -> str:
    """Stump prediction expression (SQL, works on both engines):
    polarity 1 predicts class 1 above the threshold, polarity 0 below
    or equal."""
    col = f"x{feat}"
    return (
        f"CASE WHEN {col} > {thr} THEN 1 ELSE 0 END"
        if pol == 1
        else f"CASE WHEN {col} <= {thr} THEN 1 ELSE 0 END"
    )


def q_adaboost_stump_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per boosting round: the chosen stump (feature index 1..3,
    threshold in micro units, polarity), its weighted error in micro,
    and (repeated on every row) the uniform-vote ensemble's train and
    held-out accuracy in basis points.

    Each round: ONE candidate-grid aggregation over the cached weighted
    training relation (the 54-row feature x threshold x polarity grid is
    broadcast; partial aggregation is map-side), a BOUNDED 1-row best
    pick (the bpe limit(1).collect() precedent), then a map-side weight
    update with the winning stump folded as literals. Ties break to the
    lexicographically first (error, feature, threshold, polarity).
    Honesty: on this corpus the label is independent of the text (see
    module docstring), so round errors hover near half and the vote
    near the base rate — the gate hashes that honest answer; the
    planted separable pytest corpus proves the loop drives error down
    and the vote up when signal exists."""
    docs = spread(table(spark, sf_dir, "documents"))
    feats = cache_eager(_featurize(docs))
    grid = [
        (f, k * ADA_THR_STEP, p)
        for f in (1, 2, 3)
        for k in range(1, ADA_N_THR + 1)
        for p in (1, 0)
    ]
    cand = spark.createDataFrame(grid, "feat int, thr long, pol int")
    w = feats.filter(F.col("held") == 0).selectExpr(
        "doc_id", "y", "x1", "x2", "x3", "CAST(1 AS DECIMAL(38,0)) AS w"
    )
    stumps: list[tuple[int, int, int, int, int]] = []
    for t in range(1, ADA_ROUNDS + 1):
        # cache_eager (r15, reverting the r14 cut): the reweighted
        # relation is CORPUS-sized — serialized, evictable, recomputable
        # cache per round (the bounded ADA_ROUNDS chain was fine pre-r14),
        # not an executor-pinned checkpoint.
        w = cache_eager(w)
        scored = w.crossJoin(F.broadcast(cand)).selectExpr(
            "feat",
            "thr",
            "pol",
            "w",
            "y",
            "CASE WHEN (pol = 1 AND (CASE WHEN feat = 1 THEN x1 "
            "WHEN feat = 2 THEN x2 ELSE x3 END) > thr) "
            "OR (pol = 0 AND (CASE WHEN feat = 1 THEN x1 "
            "WHEN feat = 2 THEN x2 ELSE x3 END) <= thr) "
            "THEN 1 ELSE 0 END AS h",
        )
        agg = scored.groupBy("feat", "thr", "pol").agg(
            F.expr(
                "sum(CASE WHEN h != y THEN w ELSE CAST(0 AS DECIMAL(38,0))"
                " END)"
            ).alias("e"),
            F.expr("sum(w)").alias("d"),
        )
        best = (
            agg.orderBy("e", "feat", "thr", "pol").limit(1).collect()[0]
        )  # bounded 1-row pick per round (bpe precedent)
        e_raw, d = int(best.e), int(best.d)
        e = max(e_raw, 1)
        feat, thr, pol = int(best.feat), int(best.thr), int(best.pol)
        stumps.append((t, feat, thr, pol, e_raw * 1_000_000 // d))
        h = _ada_h(feat, thr, pol)
        w = w.selectExpr(
            "doc_id",
            "y",
            "x1",
            "x2",
            "x3",
            f"CAST(w * CASE WHEN ({h}) = y THEN {e} ELSE {d - e} END"
            " AS DECIMAL(38,0)) AS w",
        )
    votes = " + ".join(f"({_ada_h(f, th, p)})" for (_, f, th, p, _) in stumps)
    majority = (ADA_ROUNDS // 2) + 1
    ens = feats.selectExpr(
        "held",
        "y",
        f"CASE WHEN ({votes}) >= {majority} THEN 1 ELSE 0 END AS pred",
    ).agg(
        F.expr(
            "CAST(sum(CASE WHEN held = 0 AND pred = y THEN 1 ELSE 0 END)"
            " * 10000 DIV sum(CASE WHEN held = 0 THEN 1 ELSE 0 END)"
            " AS BIGINT)"
        ).alias("ensemble_train_bp"),
        F.expr(
            "CAST(sum(CASE WHEN held = 1 AND pred = y THEN 1 ELSE 0 END)"
            " * 10000 DIV sum(CASE WHEN held = 1 THEN 1 ELSE 0 END)"
            " AS BIGINT)"
        ).alias("ensemble_held_bp"),
    )
    rounds = spark.createDataFrame(
        stumps,
        "round bigint, feature bigint, threshold_micro bigint,"
        " polarity bigint, werr_micro bigint",
    )
    return rounds.crossJoin(F.broadcast(ens)).orderBy("round")


def _oracle_adaboost() -> str:
    grid = (
        f"cand AS (SELECT f.f AS feat, k.k * {ADA_THR_STEP} AS thr, "
        "p.p AS pol FROM range(1, 4) f(f), "
        f"range(1, {ADA_N_THR + 1}) k(k), range(0, 2) p(p))"
    )
    hexp = (
        "CASE WHEN (pol = 1 AND (CASE WHEN feat = 1 THEN x1 "
        "WHEN feat = 2 THEN x2 ELSE x3 END) > thr) "
        "OR (pol = 0 AND (CASE WHEN feat = 1 THEN x1 "
        "WHEN feat = 2 THEN x2 ELSE x3 END) <= thr) THEN 1 ELSE 0 END"
    )

    def best_h(pfx: str) -> str:
        return (
            f"CASE WHEN ({pfx}.pol = 1 AND (CASE WHEN {pfx}.feat = 1 THEN x1 "
            f"WHEN {pfx}.feat = 2 THEN x2 ELSE x3 END) > {pfx}.thr) "
            f"OR ({pfx}.pol = 0 AND (CASE WHEN {pfx}.feat = 1 THEN x1 "
            f"WHEN {pfx}.feat = 2 THEN x2 ELSE x3 END) <= {pfx}.thr) "
            "THEN 1 ELSE 0 END"
        )

    ctes = [
        _oracle_feats_cte(),
        grid,
        "w1 AS (SELECT doc_id, y, x1, x2, x3, CAST(1 AS HUGEINT) AS w "
        "FROM feats WHERE held = 0)",
    ]
    for t in range(1, ADA_ROUNDS + 1):
        ctes.append(
            f"agg{t} AS (SELECT feat, thr, pol, "
            f"sum(CASE WHEN ({hexp}) != y THEN w ELSE CAST(0 AS HUGEINT) END) AS e, "
            f"sum(w) AS d FROM w{t}, cand GROUP BY 1, 2, 3)"
        )
        ctes.append(
            f"best{t} AS (SELECT feat, thr, pol, e, d, "
            "greatest(e, 1) AS eg "
            f"FROM agg{t} ORDER BY e, feat, thr, pol LIMIT 1)"
        )
        if t < ADA_ROUNDS:
            ctes.append(
                f"w{t + 1} AS (SELECT doc_id, y, x1, x2, x3, "
                f"CAST(w * CASE WHEN ({best_h(f'best{t}')}) = y THEN eg "
                f"ELSE d - eg END AS HUGEINT) AS w FROM w{t}, best{t})"
            )
    majority = (ADA_ROUNDS // 2) + 1
    votes = " + ".join(f"({best_h(f'best{t}')})" for t in range(1, ADA_ROUNDS + 1))
    ctes.append(
        f"ens AS (SELECT CAST(sum(CASE WHEN held = 0 AND pred = y THEN 1 "
        "ELSE 0 END) * 10000 // sum(CASE WHEN held = 0 THEN 1 ELSE 0 END) "
        "AS BIGINT) AS ensemble_train_bp, "
        "CAST(sum(CASE WHEN held = 1 AND pred = y THEN 1 ELSE 0 END) "
        "* 10000 // sum(CASE WHEN held = 1 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS ensemble_held_bp FROM (SELECT held, y, "
        f"CASE WHEN ({votes}) >= {majority} THEN 1 ELSE 0 END AS pred "
        f"FROM feats, "
        + ", ".join(f"best{t}" for t in range(1, ADA_ROUNDS + 1))
        + "))"
    )
    rounds_sql = "\nUNION ALL\n".join(
        f"SELECT CAST({t} AS BIGINT) AS round, CAST(feat AS BIGINT) AS feature, "
        f"CAST(thr AS BIGINT) AS threshold_micro, CAST(pol AS BIGINT) AS polarity, "
        f"CAST(e * 1000000 // d AS BIGINT) AS werr_micro FROM best{t}"
        for t in range(1, ADA_ROUNDS + 1)
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT r.*, ensemble_train_bp, ensemble_held_bp "
        f"FROM ({rounds_sql}) r, ens ORDER BY round"
    )


ORACLE_ADABOOST = _oracle_adaboost()


# ---------------------------------------------------------------------------
# classifier serving probe: a LITERAL text scored by the corpus-trained
# model — the per-document admission decision a quality gate makes at
# ingest (the dedup/novelty probes' sibling on the classifier lane, and
# the batch shape of streaming_logreg_score's per-micro-batch unit).
# Probe 1 re-derives from the corpus (the lowest-doc_id text scored
# FROM THE STRING — must reproduce the batch scorer's z for that row
# bit-for-bit, which the planted test asserts); probe 2 is the novel
# literal.

CLASSIFIER_QUERY_TEXT = (
    "the quick brown fox jumps over the lazy dog and it runs far away "
    "to a den in the woods"
)


def q_classifier_query_text_probe(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(probe_id, z_micro, pred) for the two serving probes under the
    corpus-trained weights: the raw margin in micro units and the
    admission decision (z > 0).

    Scale shape: the gated _fit recurrence trains once (at serving time
    the weights are a persisted 1-row artifact); each probe is a 1-row
    featurize + the broadcast weight attach — constant work per query
    string."""
    from ..sources.loader import spread, table

    docs = spread(table(spark, sf_dir, "documents"))
    feats, w = _fit(docs)
    resub = docs.orderBy("doc_id").limit(1).selectExpr(
        "CAST(1 AS BIGINT) AS doc_id", "text", "'xx' AS lang"
    )
    novel = docs.sparkSession.range(1).selectExpr(
        "CAST(2 AS BIGINT) AS doc_id",
        f"'{CLASSIFIER_QUERY_TEXT}' AS text",
        "'xx' AS lang",
    )
    pf = _featurize(resub.unionByName(novel)).select(
        F.col("doc_id").alias("probe_id"), "x0", "x1", "x2", "x3"
    )
    return (
        pf.crossJoin(F.broadcast(w))
        .selectExpr(
            "probe_id",
            f"CAST({_Z_EXPR} AS BIGINT) AS z_micro",
            f"CAST(CASE WHEN ({_Z_EXPR}) > 0 THEN 1 ELSE 0 END AS BIGINT)"
            " AS pred",
        )
        .orderBy("probe_id")
    )


def _oracle_probe() -> str:
    m = LOGREG_M
    zf = _ORACLE_ZF
    return (
        _oracle_fit_ctes()
        + rf""",
probes_raw AS (
  SELECT CAST(1 AS BIGINT) AS probe_id, text FROM (
    SELECT text FROM documents ORDER BY doc_id LIMIT 1
  )
  UNION ALL
  SELECT CAST(2 AS BIGINT), '{CLASSIFIER_QUERY_TEXT}'
),
pf AS (
  SELECT probe_id,
         CAST({m} AS BIGINT) AS x0,
         CAST(len(regexp_extract_all(lower(trim(text)), '{_STOP_RE}'))
              * {m} // len(regexp_split_to_array(trim(text), '\s+'))
              AS BIGINT) AS x1,
         CAST(length(regexp_replace(trim(text), '[^A-Za-z]', '', 'g'))
              * {m} // greatest(length(trim(text)), 1) AS BIGINT) AS x2,
         CAST(least(len(regexp_split_to_array(trim(text), '\s+')),
                    {LOGREG_LEN_CAP}) * {m} // {LOGREG_LEN_CAP}
              AS BIGINT) AS x3
  FROM probes_raw
)
SELECT probe_id,
       CAST({zf} AS BIGINT) AS z_micro,
       CAST(CASE WHEN {zf} > 0 THEN 1 ELSE 0 END AS BIGINT) AS pred
FROM pf f, w{LOGREG_ITERS}_ w
ORDER BY probe_id
"""
    )


ORACLE_CLASSIFIER_QUERY_TEXT_PROBE = _oracle_probe()


# A contrasting second serving probe for the frozen lane: no stopwords,
# low alphabetic ratio — the features land far from the query-text
# probe's, so the gate hashes two genuinely different scoring rows.
CLASSIFIER_JUNK_TEXT = (
    "zq9 77xx 0f3a ---- 1234 9911 kpq0 #### 8x8x 55zz 0000 qqq9"
)


def q_classifier_query_frozen_probe(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(probe_id, z_micro, pred) for two literal serving probes scored
    under the PERSISTED weight artifact (operators/logreg_weights.py,
    written by tools/freeze_logreg_weights.py — the freeze-artifact
    precedent of the IVF centroids / PQ codebooks): the honest serving
    twin of classifier_query_text_probe, which retrains at query time
    (r12 verdict hygiene note). Deployment shape: train offline, freeze
    the weights, score any incoming string in constant time.

    Scale shape: ZERO corpus scans — both probes are literals, the
    weights are four folded BIGINT constants, the whole plan is a 2-row
    local projection regardless of corpus size."""
    from .logreg_weights import FROZEN_W

    probes = spark.range(1).selectExpr(
        "CAST(1 AS BIGINT) AS doc_id",
        f"'{CLASSIFIER_QUERY_TEXT}' AS text",
        "'xx' AS lang",
    ).unionByName(
        spark.range(1).selectExpr(
            "CAST(2 AS BIGINT) AS doc_id",
            f"'{CLASSIFIER_JUNK_TEXT}' AS text",
            "'xx' AS lang",
        )
    )
    pf = _featurize(probes).select(
        F.col("doc_id").alias("probe_id"), "x0", "x1", "x2", "x3"
    )
    w = spark.range(1).selectExpr(
        *[f"CAST({FROZEN_W[j]} AS BIGINT) AS w{j}" for j in range(4)]
    )
    return (
        pf.crossJoin(F.broadcast(w))
        .selectExpr(
            "probe_id",
            f"CAST({_Z_EXPR} AS BIGINT) AS z_micro",
            f"CAST(CASE WHEN ({_Z_EXPR}) > 0 THEN 1 ELSE 0 END AS BIGINT)"
            " AS pred",
        )
        .orderBy("probe_id")
    )


def _oracle_frozen_probe() -> str:
    from .logreg_weights import FROZEN_W

    m = LOGREG_M
    zf = _ORACLE_ZF
    weights = ", ".join(
        f"CAST({FROZEN_W[j]} AS BIGINT) AS w{j}" for j in range(4)
    )
    return rf"""
WITH w AS (SELECT {weights}),
probes_raw AS (
  SELECT CAST(1 AS BIGINT) AS probe_id, '{CLASSIFIER_QUERY_TEXT}' AS text
  UNION ALL
  SELECT CAST(2 AS BIGINT), '{CLASSIFIER_JUNK_TEXT}'
),
pf AS (
  SELECT probe_id,
         CAST({m} AS BIGINT) AS x0,
         CAST(len(regexp_extract_all(lower(trim(text)), '{_STOP_RE}'))
              * {m} // len(regexp_split_to_array(trim(text), '\s+'))
              AS BIGINT) AS x1,
         CAST(length(regexp_replace(trim(text), '[^A-Za-z]', '', 'g'))
              * {m} // greatest(length(trim(text)), 1) AS BIGINT) AS x2,
         CAST(least(len(regexp_split_to_array(trim(text), '\s+')),
                    {LOGREG_LEN_CAP}) * {m} // {LOGREG_LEN_CAP}
              AS BIGINT) AS x3
  FROM probes_raw
)
SELECT probe_id,
       CAST({zf} AS BIGINT) AS z_micro,
       CAST(CASE WHEN {zf} > 0 THEN 1 ELSE 0 END AS BIGINT) AS pred
FROM pf f, w
ORDER BY probe_id
"""


ORACLE_CLASSIFIER_QUERY_FROZEN_PROBE = _oracle_frozen_probe()


QUERIES = {
    "adaboost_stump_report": q_adaboost_stump_report,
    "classifier_query_text_probe": q_classifier_query_text_probe,
    "classifier_query_frozen_probe": q_classifier_query_frozen_probe,
    "logreg_quality_report": q_logreg_quality_report,
    "logreg_threshold_sweep": q_logreg_threshold_sweep,
    "logreg_ablation_report": q_logreg_ablation_report,
    "logreg_calibration_curve": q_logreg_calibration_curve,
    "logreg_cv_report": q_logreg_cv_report,
}

ORACLES = {
    "adaboost_stump_report": ORACLE_ADABOOST,
    "classifier_query_text_probe": ORACLE_CLASSIFIER_QUERY_TEXT_PROBE,
    "classifier_query_frozen_probe": ORACLE_CLASSIFIER_QUERY_FROZEN_PROBE,
    "logreg_quality_report": ORACLE_LOGREG_QUALITY,
    "logreg_threshold_sweep": ORACLE_LOGREG_THRESHOLD_SWEEP,
    "logreg_ablation_report": ORACLE_LOGREG_ABLATION,
    "logreg_calibration_curve": ORACLE_LOGREG_CALIBRATION,
    "logreg_cv_report": ORACLE_LOGREG_CV,
}
