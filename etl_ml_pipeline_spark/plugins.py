"""Import side-effect module: registers every built-in plugin.

Importing this module populates the SOURCES/TRANSFORMS/SINKS registries.

Core modules import UNGUARDED: a broken core module must fail loudly at
import time, not silently drop its operators (and, worse, the queries +
oracles that validate them — a blanket ImportError guard here once hid a
missing module with zero signal from the correctness harness). Only
modules with genuinely optional third-party dependencies (playwright)
are guarded, and their failures are recorded in
``_OPTIONAL_IMPORT_ERRORS`` which the CLI surfaces via --list-modules.
"""

# Sources
from etl_ml_pipeline_spark.sources import alpha_vantage as _src_av  # noqa: F401
from etl_ml_pipeline_spark.sources import files as _src_files  # noqa: F401
from etl_ml_pipeline_spark.sources import rest_api as _src_rest  # noqa: F401

# Transforms
from etl_ml_pipeline_spark.operators import bloom as _t_bloom  # noqa: F401
from etl_ml_pipeline_spark.operators import cleaning as _t_cleaning  # noqa: F401
from etl_ml_pipeline_spark.operators import dedup as _t_dedup  # noqa: F401
from etl_ml_pipeline_spark.operators import drift as _t_drift  # noqa: F401
from etl_ml_pipeline_spark.operators import indicators as _t_ind  # noqa: F401
from etl_ml_pipeline_spark.operators import kmeans as _t_kmeans  # noqa: F401
from etl_ml_pipeline_spark.operators import multimodal as _t_mm  # noqa: F401
from etl_ml_pipeline_spark.operators import packing as _t_pack  # noqa: F401
from etl_ml_pipeline_spark.operators import pass_through as _t_pass  # noqa: F401
from etl_ml_pipeline_spark.operators import relational as _t_rel  # noqa: F401
from etl_ml_pipeline_spark.operators import sessionize as _t_sess  # noqa: F401
from etl_ml_pipeline_spark.operators import similarity as _t_sim  # noqa: F401
from etl_ml_pipeline_spark.operators import text as _t_text  # noqa: F401
from etl_ml_pipeline_spark.operators import url as _t_url  # noqa: F401
from etl_ml_pipeline_spark.operators import validation as _t_val  # noqa: F401

# Sinks
from etl_ml_pipeline_spark.sinks import bucketed as _sink_bucketed  # noqa: F401
from etl_ml_pipeline_spark.sinks import files as _sink_files  # noqa: F401
from etl_ml_pipeline_spark.sinks import sql_database as _sink_sql  # noqa: F401

_OPTIONAL_IMPORT_ERRORS: dict[str, str] = {}

# Genuinely optional: needs the playwright package (not in every env).
for _mod in ("etl_ml_pipeline_spark.sources.playwright_scraper",):
    try:
        __import__(_mod)
    except ImportError as exc:
        _OPTIONAL_IMPORT_ERRORS[_mod] = str(exc)
