"""State-store introspection (Spark 4's ``statestore`` data source).

Production streaming jobs need to answer "what is in my state right
now?" without stopping the query — for debugging watermark issues,
sizing state, or verifying a stateful operator's invariants. Spark 4
exposes every checkpoint's state store as a read-only batch source;
this module wraps it for the engine's stateful operators.

``read_group_state`` flattens the (key, groupState) rows of an
``applyInPandasWithState`` checkpoint (e.g. ``stream_rle_islands``'s
open runs) into a plain DataFrame — one row per key currently held in
state. Reading is a normal batch scan of the checkpoint files: no
interaction with the running query, safe while it runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_group_state(
    spark: SparkSession,
    checkpoint_dir: str,
    batch_id: int | None = None,
) -> DataFrame:
    """Read an applyInPandasWithState checkpoint's current state as a
    batch DataFrame: key columns + the state struct's fields,
    flattened. ``batch_id`` selects a historical snapshot (default:
    the latest committed batch)."""
    reader = spark.read.format("statestore")
    if batch_id is not None:
        reader = reader.option("batchId", batch_id)
    st = reader.load(checkpoint_dir)
    return st.select(F.col("key.*"), F.col("value.groupState.*"))
