from bbdc20_submission_spark.sources.harness import HARNESS_TABLES, load_table, load_tables

__all__ = ["HARNESS_TABLES", "load_table", "load_tables"]
