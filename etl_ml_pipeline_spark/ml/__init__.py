"""MLlib port of the reference's ML sidecar (predict.py)."""

from etl_ml_pipeline_spark.ml.predict import (  # noqa: F401
    create_target,
    expanding_folds,
    feature_importances,
    run_prediction,
    train_evaluate,
)
