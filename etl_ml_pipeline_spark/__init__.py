"""etl_ml_pipeline_spark — a PySpark-native analytics/ETL engine.

A from-scratch rebuild of the capabilities of the reference ETL framework
(arman-keshavarz123/ETL-ML-Pipeline, surveyed in /root/repo/SURVEY.md):
a declarative config-driven Extract -> Transform -> Load pipeline, plus a
deliberately wider Spark-first operator library (relational core, window
functions, time-series indicators, dedup, similarity search, text
analysis) designed to scale to very large clusters via lazy DataFrame
plans, Catalyst optimization, and partition-aware operators.

Nothing here is a code port: the reference is a single-process Pandas
engine; every operator below is re-expressed as lazy PySpark DataFrame
transformations (see SURVEY.md section 2 for the mapping table).
"""

__version__ = "0.1.0"

from etl_ml_pipeline_spark.session import get_spark  # noqa: F401
