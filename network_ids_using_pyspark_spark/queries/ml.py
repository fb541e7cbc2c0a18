"""ML-pipeline queries (SURVEY.md §2.9, phase 5).

Model internals are not SQL-expressible, so these are rows-only checks
(the driver records row-count/schema stability); the *quality* contract
— BASELINE.md metric floors — is asserted by ``tests/test_ml.py``.

Input is the deterministic synthetic flow fixture
(``sources/synthetic.py``) sized to the scale factor like the driver's
lineitem (~6M rows × sf), so the bench at sf0.1 trains at the same
order of magnitude as the reference's 1M-row Colab run (BASELINE.md).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..ml.pipeline import (
    confusion_matrix,
    evaluate_multiclass,
    prepare_flow_features,
    train_classifier,
)
from ..operators.sampling import anti_join_split, hash_sample
from ..sources.synthetic import synth_flows
from . import register


def _sf_of(sf_dir: str) -> float:
    return float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])


def _n_rows(sf_dir: str) -> int:
    return max(2_000, int(6_000_000 * _sf_of(sf_dir)))


_SPLIT_CACHE: dict = {}


def _prepared_split(spark, sf_dir):
    # the six ML queries share one prepared/cached feature frame per
    # (session, sf) — queries stay independent, the fixture prep isn't
    # recomputed six times
    key = (id(spark), sf_dir)
    if key not in _SPLIT_CACHE:
        flows = synth_flows(spark, _n_rows(sf_dir))
        prepared = prepare_flow_features(flows).cache()
        # 80/20 deterministic hash split; anti-join for the complement —
        # the scalable replacement for collect + NOT-IN (modelling.py:91-93)
        test = hash_sample(prepared, "flow_id", 0.2, seed="ml-split")
        train = anti_join_split(prepared, test, "flow_id")
        _SPLIT_CACHE[key] = (train, test)
    return _SPLIT_CACHE[key]


def _metrics_df(spark, model_name: str, metrics: dict[str, float]):
    rows = [(model_name, k, float(v)) for k, v in sorted(metrics.items())]
    return spark.createDataFrame(rows, "model string, metric string, value double")


_MODEL_CACHE: dict = {}


def _train_eval(spark, sf_dir, kind: str, **kw):
    # one fitted model per (session, sf, kind): ml_train_rf and
    # ml_confusion_rf share the RF instead of training twice (the
    # cached session object is held strongly, so ids can't collide)
    key = (id(spark), sf_dir, kind)
    if key not in _MODEL_CACHE:
        train, test = _prepared_split(spark, sf_dir)
        feat = "scaled_features" if kind == "nb" else "features"
        model = train_classifier(train, kind, features_col=feat, **kw)
        _MODEL_CACHE[key] = (spark, model, test)
    _, model, test = _MODEL_CACHE[key]
    preds = model.transform(test)
    return preds, _metrics_df(spark, kind, evaluate_multiclass(preds))


@register("ml_train_rf", None)
def q_ml_train_rf(spark, sf_dir):
    """M5: RandomForest train+eval → (model, metric, value) rows."""
    _, m = _train_eval(spark, sf_dir, "rf")
    return m


@register("ml_train_dt", None)
def q_ml_train_dt(spark, sf_dir):
    """M6: DecisionTree train+eval."""
    _, m = _train_eval(spark, sf_dir, "dt")
    return m


@register("ml_train_nb", None)
def q_ml_train_nb(spark, sf_dir):
    """M7: multinomial NaiveBayes (smoothing=1.0) on min-max-scaled
    features — the scaling is what keeps the multinomial likelihoods
    defined, exactly as in the reference (modelling.py:130-137)."""
    _, m = _train_eval(spark, sf_dir, "nb")
    return m


@register("ml_train_mlp", None)
def q_ml_train_mlp(spark, sf_dir):
    """M8: MLP, layers [13 features, 8, 4, 3 classes], maxIter=100,
    blockSize=128, seed=1234 — the reference's notebook configuration
    shape (ISAA_Review_3.ipynb:920,935-946) at this fixture's width."""
    _, m = _train_eval(spark, sf_dir, "mlp", layers=[13, 8, 4, 3])
    return m


@register("ml_confusion_rf", None)
def q_ml_confusion_rf(spark, sf_dir):
    """M10/G8: confusion matrix as a distributed k×k aggregate (tall
    form) — never a driver-side collect."""
    preds, _ = _train_eval(spark, sf_dir, "rf")
    return confusion_matrix(preds).orderBy("label", "prediction")
