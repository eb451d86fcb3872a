"""wafer_defect_data_pipeline_spark — a PySpark-native analytics engine.

Brand-new implementation of the capabilities of the reference repo
(Sanghyeon-Jo/Wafer-defect-data-pipeline, a single-node pandas wafer-defect
ETL pipeline) re-expressed Spark-first, plus the large-scale data-pipeline
extension surface (dedup, similarity search, text analysis, multimodal
columns, event-time analytics). See SURVEY.md for the blueprint.
"""

__version__ = "0.1.0"

from .plans.pipeline import WaferPipeline  # noqa: F401
from .session import get_spark  # noqa: F401
from .sources.csv import load_data  # noqa: F401
