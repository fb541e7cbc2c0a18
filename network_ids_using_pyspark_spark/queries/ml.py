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


def _flows_profile_sql(n: int = 60_000) -> str:
    """Oracle that REGENERATES the synthetic flow fixture in DuckDB via
    the same md5 arithmetic as sources/synthetic.py, then profiles it —
    proving generator + profile are engine-independent end to end.
    Only exp/pow-free columns (transcendentals are not cross-engine
    portable; see functions/numeric.py docs)."""

    def u(seed: str) -> str:
        h = (
            f"CAST(concat('0x', substring(md5(concat('flows:{seed}', "
            f"CAST(id AS VARCHAR))), 1, 15)) AS BIGINT)"
        )
        return f"({h} / 1152921504606846976.0)"

    return f"""
    WITH raw AS (
      SELECT id,
             {u('label')} AS u_label,
             {u('dur')} AS u_dur, {u('dneg')} AS u_dneg,
             {u('port')} AS u_port, {u('proto')} AS u_proto,
             {u('syn')} AS u_syn, {u('ack')} AS u_ack
      FROM range(0, {n}) t(id)
    ), flows AS (
      SELECT
        CASE WHEN u_label < 0.85 THEN 'Benign'
             WHEN u_label < 0.95 THEN 'FTP-BruteForce'
             ELSE 'SSH-BruteForce' END AS label,
        CASE WHEN u_label < 0.85 THEN 0 WHEN u_label < 0.95 THEN 1 ELSE 2 END AS cls,
        CASE WHEN u_dneg < 0.001 THEN -919011000000
             ELSE CAST(1 + floor(u_dur * 120000000) AS BIGINT) END AS flow_duration,
        CAST(CASE WHEN u_proto < 0.8 THEN 6 ELSE 17 END AS INTEGER) AS protocol,
        CAST(CASE WHEN u_label >= 0.85 AND u_label < 0.95 THEN 21
                  WHEN u_label >= 0.95 THEN 22
                  WHEN u_port < 0.4 THEN 80
                  WHEN u_port < 0.7 THEN 443
                  WHEN u_port < 0.8 THEN 3389
                  ELSE 65533 END AS INTEGER) AS dst_port,
        CASE WHEN u_syn < 0.2 + (CASE WHEN u_label < 0.85 THEN 0 WHEN u_label < 0.95 THEN 1 ELSE 2 END) * 0.3
             THEN 1 ELSE 0 END AS syn,
        CASE WHEN u_ack < 0.6 THEN 1 ELSE 0 END AS ack
      FROM raw
    )
    SELECT label, dst_port, protocol,
           COUNT(*) AS n,
           CAST(SUM(syn) AS BIGINT) AS n_syn,
           CAST(SUM(ack) AS BIGINT) AS n_ack,
           MAX(flow_duration) AS max_duration,
           MIN(flow_duration) AS min_duration
    FROM flows
    GROUP BY label, dst_port, protocol
    """


@register("flows_port_label_profile", _flows_profile_sql())
def q_flows_port_label_profile(spark, sf_dir):
    """Reference-shaped IDS profile over the synthetic flow fixture
    (fixed n=60k for sf-independence): flows per (label, port,
    protocol) with flag totals and duration extremes — the oracle
    regenerates the fixture itself in DuckDB, so this hash-checks the
    generator AND the profile together."""
    flows = synth_flows(spark, 60_000)
    f = flows.select(
        F.col("Label").alias("label"),
        F.col("Dst Port").alias("dst_port"),
        F.col("Protocol").alias("protocol"),
        F.col("Flow Duration").alias("flow_duration"),
        F.col("SYN Flag Cnt").alias("syn"),
        F.col("ACK Flag Cnt").alias("ack"),
    )
    return f.groupBy("label", "dst_port", "protocol").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("syn").alias("n_syn"),
        F.sum("ack").alias("n_ack"),
        F.max("flow_duration").alias("max_duration"),
        F.min("flow_duration").alias("min_duration"),
    )
