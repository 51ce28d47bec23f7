"""Import side-effect module: registers every built-in plugin.

Importing this module populates the SOURCES/TRANSFORMS/SINKS registries.
Optional-dependency plugins guard their imports.
"""

# Sources
from etl_ml_pipeline_spark.sources import files as _src_files  # noqa: F401

# Transforms
from etl_ml_pipeline_spark.operators import pass_through as _t_pass  # noqa: F401

# Sinks
from etl_ml_pipeline_spark.sinks import files as _sink_files  # noqa: F401

_OPTIONAL_IMPORT_ERRORS: dict[str, str] = {}

for _mod in (
    "etl_ml_pipeline_spark.sources.rest_api",
    "etl_ml_pipeline_spark.sources.alpha_vantage",
    "etl_ml_pipeline_spark.sources.playwright_scraper",
    "etl_ml_pipeline_spark.operators.cleaning",
    "etl_ml_pipeline_spark.operators.validation",
    "etl_ml_pipeline_spark.operators.relational",
    "etl_ml_pipeline_spark.operators.indicators",
    "etl_ml_pipeline_spark.operators.sessionize",
    "etl_ml_pipeline_spark.operators.dedup",
    "etl_ml_pipeline_spark.operators.similarity",
    "etl_ml_pipeline_spark.operators.text",
    "etl_ml_pipeline_spark.operators.multimodal",
    "etl_ml_pipeline_spark.sinks.sql_database",
    "etl_ml_pipeline_spark.sinks.bucketed",
):
    try:
        __import__(_mod)
    except ImportError as exc:  # optional deps (e.g. playwright) absent
        _OPTIONAL_IMPORT_ERRORS[_mod] = str(exc)
