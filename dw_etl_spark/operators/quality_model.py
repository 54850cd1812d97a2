"""Model-based document quality scoring: a distributed linear
classifier over hashed n-gram features (the fastText-style design
every production pretraining pipeline ends up with — e.g. the CCNet /
GPT-3 "quality classifier" stage), trained and applied entirely with
``pyspark.ml`` primitives.

Why a MODEL when ``functions.text.gopher_keep`` already filters?
Heuristics are high-precision/low-recall gates; a classifier
generalizes from examples (e.g. "looks like the reference corpus") and
yields a continuous score you can threshold per mixture, curriculum,
or ablation. The standard bootstrap — used here as
``weak_quality_labels`` — is distant supervision: label documents by
the heuristic verdict (or by membership in a trusted reference
corpus), train the classifier, then score everything with the model,
which smooths over the heuristic's hard edges.

Scale shape (the reason this is fastText-style, not vocab-style):

- **HashingTF is stateless.** Features are ``hash(ngram) mod D`` — no
  vocabulary to build, no dictionary shuffle, no OOV path. Featurizing
  100 TB is one narrow map; the only model state is two dense
  D-vectors (IDF weights + LR coefficients), broadcast to executors.
- **Training is sample-sized, scoring is corpus-sized.** Train on a
  bounded sample (``train_quality_model`` does NOT require the full
  corpus; callers pass the sample — standard practice), then
  ``score_quality_model`` is a pure per-row transform: no shuffle, no
  aggregation, embarrassingly parallel over any partitioning.
- **LR via ``pyspark.ml`` is the distributed implementation** (L-BFGS
  with ``treeAggregate`` gradients), not a driver loop — each
  iteration is one pass over the (cached) training frame.

Determinism: HashingTF is seed-free (murmur3 of the term), IDF is a
deterministic aggregate, and L-BFGS from a fixed init on the same
sample converges to the same optimum of a convex objective —
prediction invariance under repartitioning is property-tested with a
tolerance on the probabilities (float reduction order may differ).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dw_etl_spark.functions.text import gopher_keep, tokens


def _strip_training_summary(ml_model) -> None:
    """Drop a fitted pyspark.ml model's training summary in place.

    Why this is load-bearing and not cosmetic: ``HasTrainingSummary``
    models keep a ``trainingSummary`` that pins the *SparkSession*, and
    every ``model.transform`` ScalaUDF closure captures the model — so
    the session rides along into task serialization. The classic
    session's ``observationManager`` field starts out null (lazily
    created by the FIRST ``df.observe`` on the session) and
    ``ObservationManager`` is not ``Serializable``; the moment any
    observe-based metric has run (``functions/metrics.py``,
    ``operators/expectations.py``), a summary-carrying model crashes
    every later transform with ``NotSerializableException:
    ObservationManager``. Stripping the summary removes the session
    from the closure graph entirely, which is also the right scale
    shape: the scorer's only state should be two broadcast D-vectors,
    not a handle on the driver session. Scala ``private[ml]``
    ``setSummary`` compiles to a public JVM method, so py4j can call
    it directly; best-effort (no-op under Spark Connect, where
    ``_java_obj`` is absent and the bug cannot occur).
    """
    jo = getattr(ml_model, "_java_obj", None)
    if jo is None:  # connect-backed model: nothing to strip
        return
    try:
        if jo.hasSummary():
            from pyspark import SparkContext

            jvm = SparkContext._active_spark_context._jvm
            jo.setSummary(jvm.scala.Option.empty())
    except Exception:
        pass  # stripping is an optimization + crash guard, never fatal


def _ngram_terms(text_col: str, bigrams: bool) -> Column:
    """Lower-cased word unigrams (+ joined bigrams) as one array —
    the fastText feature recipe, built with JVM-side expressions."""
    toks = tokens(F.lower(F.col(text_col)))
    if not bigrams:
        return toks
    grams = F.zip_with(
        toks,
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat_ws("_", a, b),
    )
    # zip_with pads the shorter side with NULL, so the last element is
    # a stray unigram — keep the first n-1 positions only
    grams = F.slice(grams, 1, F.greatest(F.size(toks) - 1, F.lit(0)))
    return F.concat(toks, grams)


def weak_quality_labels(
    df: DataFrame, text_col: str = "text", **gopher_kwargs
) -> DataFrame:
    """Distant supervision: stamp a {0.0, 1.0} ``label`` column from
    the Gopher heuristic verdict (thresholds overridable — short-doc
    corpora lower ``min_words``). One narrow projection, no shuffle."""
    return df.withColumn(
        "label",
        F.when(gopher_keep(text_col, **gopher_kwargs), F.lit(1.0)).otherwise(
            F.lit(0.0)
        ),
    )


@dataclass
class QualityModel:
    """Fitted scorer: hashing dimensionality + optional IDF weights +
    LR coefficients. All state is two broadcastable dense vectors."""

    num_features: int
    bigrams: bool
    idf_model: object  # pyspark.ml.feature.IDFModel | None
    lr_model: object  # pyspark.ml.classification.LogisticRegressionModel


def train_quality_model(
    sample: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    num_features: int = 1 << 18,
    bigrams: bool = True,
    use_idf: bool = True,
    max_iter: int = 50,
    reg_param: float = 1e-4,
) -> QualityModel:
    """Fit the hashed-n-gram logistic scorer on a LABELED SAMPLE
    (callers bound the sample; training cost is sample-sized). The
    sample is featurized once and cached across L-BFGS iterations."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import IDF, HashingTF

    feats = sample.select(
        F.col(label_col).cast("double").alias("label"),
        _ngram_terms(text_col, bigrams).alias("terms"),
    )
    tf = HashingTF(
        inputCol="terms", outputCol="tf", numFeatures=num_features
    )
    vec = tf.transform(feats)
    idf_model = None
    if use_idf:
        idf_model = IDF(inputCol="tf", outputCol="features").fit(vec)
        vec = idf_model.transform(vec)
    else:
        vec = vec.withColumnRenamed("tf", "features")
    vec = vec.select("label", "features").persist()
    try:
        lr = LogisticRegression(
            maxIter=max_iter, regParam=reg_param, standardization=False
        )
        lr_model = lr.fit(vec)
    finally:
        vec.unpersist()
    # See _strip_training_summary: without this, the model cannot be
    # applied on any session where an observe metric has ever run.
    _strip_training_summary(lr_model)
    return QualityModel(num_features, bigrams, idf_model, lr_model)


def score_quality_model(
    df: DataFrame,
    model: QualityModel,
    text_col: str = "text",
    out_col: str = "quality_prob",
) -> DataFrame:
    """Append P(high-quality) per document. Pure per-row transform —
    featurize (stateless hash), dot with the broadcast model, sigmoid.
    No shuffle; scales to the full corpus on any partitioning."""
    from pyspark.ml.feature import HashingTF
    from pyspark.ml.functions import vector_to_array

    tf = HashingTF(
        inputCol="__terms", outputCol="__tf", numFeatures=model.num_features
    )
    vec = tf.transform(
        df.withColumn("__terms", _ngram_terms(text_col, model.bigrams))
    )
    if model.idf_model is not None:
        idf = model.idf_model.copy()
        idf.setInputCol("__tf").setOutputCol("__features")
        vec = idf.transform(vec)
    else:
        vec = vec.withColumnRenamed("__tf", "__features")
    lr = model.lr_model.copy()
    # Defense in depth for models trained elsewhere (ml.copy preserves
    # the session-pinning training summary; see _strip_training_summary).
    _strip_training_summary(lr)
    lr.setFeaturesCol("__features").setPredictionCol(
        "__pred"
    ).setProbabilityCol("__prob").setRawPredictionCol("__raw")
    scored = lr.transform(vec)
    return scored.withColumn(
        out_col, vector_to_array(F.col("__prob")).getItem(1)
    ).drop("__terms", "__tf", "__features", "__pred", "__prob", "__raw")


def linear_quality_score(
    df: DataFrame,
    term_weights: dict[str, float],
    intercept: float = 0.0,
    text_col: str = "text",
    bigrams: bool = True,
    out_col: str = "quality_prob",
) -> DataFrame:
    """Fixed-weight scoring twin of ``score_quality_model``: the same
    ``_ngram_terms`` featurization and dot→sigmoid math, with an
    EXPLICIT term → weight map (the hand-set / distilled /
    interpretable coefficient form — e.g. a fastText model exported
    as its top-weight terms) instead of hashed buckets.

    The dot product is computed count-based — ``intercept + Σ_t w_t ·
    count(t in terms)`` in the map's iteration order — as pure JVM
    expressions (array filter + size per term), no UDF, no ml
    dependency, no shuffle: a per-row transform that scales to the
    full corpus on any partitioning, exactly like the hashed scorer.

    Equivalence to the hashed path (pytest-pinned): HashingTF's
    bucket-TF is the SUM of the counts of the terms hashing to that
    bucket, so for any coefficient vector the hashed dot equals the
    term-keyed dot with ``w_t = coef[bucket(t)]`` over the corpus's
    distinct terms — collisions included. This form is also exactly
    replayable in ANSI SQL (the ``qm_prob`` column of the
    ``quality_filters`` gate row), which the hash-indexed vector is
    not."""
    terms_col = "__lin_terms"
    scored = df.withColumn(terms_col, _ngram_terms(text_col, bigrams))

    def _eq(term: str):
        lit = F.lit(term)
        # one-arg closure: a two-arg lambda would be taken for
        # F.filter's (element, index) form
        return lambda x: x == lit

    dot = F.lit(float(intercept))
    for t, w in term_weights.items():
        cnt = F.size(F.filter(F.col(terms_col), _eq(t)))
        dot = dot + F.lit(float(w)) * cnt.cast("double")
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-dot))
    return scored.withColumn(out_col, prob).drop(terms_col)


def quality_model_filter(
    df: DataFrame,
    model: QualityModel,
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """Keep documents scoring at or above ``threshold`` — the
    model-based sibling of ``gopher_keep`` filtering."""
    scored = score_quality_model(df, model, text_col, out_col="__q")
    return scored.filter(F.col("__q") >= threshold).drop("__q")
