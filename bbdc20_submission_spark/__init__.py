"""bbdc20_submission_spark — a PySpark-native analytics engine.

Re-expresses the query / data-processing capability surface of the
reference pipeline (mfluegge/bbdc20-submission, see SURVEY.md) as an
idiomatic Spark DataFrame/SQL operator library, plus the
large-scale-training-data operators (dedup, similarity search, text
analysis, multimodal plumbing) that a 100 TB pipeline needs.

Layout:
    session.py    SparkSession factory (AQE on, tuned shuffle partitions)
    sources/      readers for the harness parquet tables and the
                  reference-native CSV contracts (labels / EMG / mocap)
    operators/    composable DataFrame -> DataFrame operators
    functions/    scalar/column-level helper expressions
    plans/        end-to-end pipeline recompositions
    streaming/    Structured Streaming variants of the windowed operators
"""

from bbdc20_submission_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
