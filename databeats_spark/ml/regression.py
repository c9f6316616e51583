"""Popularity-prediction pipelines — reference §2.10 M1-M5, M9-M10.

The reference trains scikit-learn regressors on a driver-sized pandas
frame (8k rows, ml_training_dag.py:53-98; Prediction_Model.ipynb):
RandomForest + BayesSearchCV(cv=3), LinearRegression + RFE, XGBoost +
TPE. Spark ML re-expression: VectorAssembler → estimator →
CrossValidator(ParamGridBuilder) — same split/CV/metric semantics,
distributed fit. Quality gates are tolerance-based (SURVEY §5): ML is
excluded from hash-matching.

Known reference defects NOT reproduced (SURVEY §5 defect list): the
hyperopt sign bug (loss=-rmse maximizing RMSE, Prediction_Model
cell-11) and the BigQueryHook NameError (ml_training_dag.py:31).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.evaluation import RegressionEvaluator
from pyspark.ml.feature import VectorAssembler
from pyspark.ml.regression import GBTRegressor, LinearRegression, RandomForestRegressor
from pyspark.ml.tuning import CrossValidator, ParamGridBuilder
from pyspark.sql import DataFrame

from databeats_spark.schemas import AUDIO_FEATURE_COLS

LABEL = "popularity"


@dataclass
class TrainedModel:
    model: PipelineModel
    rmse: float
    algo: str


def _estimator(algo: str, seed: int):
    if algo == "rf":
        # reference best config family: deep forest, few features per
        # split (Prediction_Model cell-15: max_depth=100, max_features=3)
        return RandomForestRegressor(labelCol=LABEL, seed=seed), lambda est: (
            ParamGridBuilder()
            .addGrid(est.maxDepth, [8, 12])
            .addGrid(est.numTrees, [50, 100])
            .build()
        )
    if algo == "gbt":
        # stands in for the reference's XGBoost path (M4); SparkXGB
        # needs the xgboost package — absent in this image
        return GBTRegressor(labelCol=LABEL, seed=seed), lambda est: (
            ParamGridBuilder().addGrid(est.maxDepth, [4, 6]).addGrid(est.maxIter, [30]).build()
        )
    if algo == "lr":
        # LinearRegression; elastic-net grid stands in for RFE's
        # feature selection (L1 zeroes weak features, M3)
        return LinearRegression(labelCol=LABEL), lambda est: (
            ParamGridBuilder()
            .addGrid(est.regParam, [0.0, 0.1])
            .addGrid(est.elasticNetParam, [0.0, 1.0])
            .build()
        )
    raise ValueError(f"unknown algo {algo!r}")


def train_popularity_model(
    df: DataFrame,
    algo: str = "rf",
    feature_cols: tuple[str, ...] = AUDIO_FEATURE_COLS,
    cv_folds: int = 3,
    train_frac: float = 0.8,
    seed: int = 42,
) -> TrainedModel:
    """M1 (seeded split) + M2/M3/M5 (CV grid search) + M10 (transform).

    Returns the fitted pipeline and held-out RMSE. Mirrors the
    reference flow: split → cv-fit on train → refit pipeline scores the
    held-out 20% (the reference then refits on ALL data before
    persisting, ml_training_dag.py:95 — callers can do the same).
    """
    data = df.select(LABEL, *feature_cols).na.drop()
    train, test = data.randomSplit([train_frac, 1 - train_frac], seed=seed)

    est, grid_fn = _estimator(algo, seed)
    pipe = Pipeline(
        stages=[VectorAssembler(inputCols=list(feature_cols), outputCol="features"), est]
    )
    evaluator = RegressionEvaluator(labelCol=LABEL, metricName="rmse")
    cv = CrossValidator(
        estimator=pipe,
        estimatorParamMaps=grid_fn(est),
        evaluator=evaluator,
        numFolds=cv_folds,
        seed=seed,
        parallelism=4,
    )
    fitted = cv.fit(train)
    rmse = evaluator.evaluate(fitted.bestModel.transform(test))
    return TrainedModel(model=fitted.bestModel, rmse=float(rmse), algo=algo)


def feature_importances(trained: TrainedModel, feature_cols=AUDIO_FEATURE_COLS) -> dict[str, float]:
    """M9 feature-importance report (reference app.py:121-144)."""
    last = trained.model.stages[-1]
    if hasattr(last, "featureImportances"):
        vec = last.featureImportances
        return {c: float(vec[i]) for i, c in enumerate(feature_cols)}
    if hasattr(last, "coefficients"):
        return {c: float(abs(last.coefficients[i])) for i, c in enumerate(feature_cols)}
    return {}
