"""Driver-local rows → DataFrame through the Arrow path.

The threshold-gated driver fast paths (connected components, closures,
rank maps) end by uploading a driver-resident result list back into a
DataFrame. A plain ``spark.createDataFrame(list, schema)`` serializes the
rows one by one through py4j/pickle — measurably slow from a few tens of
thousands of rows. Routing the list through a pandas DataFrame instead
engages Spark's Arrow converter (``spark.sql.execution.arrow.pyspark.
enabled``, on in :func:`sparkrdf.session.get_spark`), which ships the
batch as one Arrow payload; when Arrow is off Spark falls back to the row
path by itself, so this is never less correct — only faster.

Only used for simple flat schemas (strings/ints/doubles, no NULLs in
non-string columns — pandas would coerce int-with-NaN to float).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def local_rows_df(spark: SparkSession, rows, schema) -> DataFrame:
    """``createDataFrame`` for a driver-local list of flat tuples.

    ``schema`` must be a StructType (the fast-path callers all have one);
    anything else — or an empty list — falls through to the plain path.
    """
    if not isinstance(schema, StructType) or not rows:
        return spark.createDataFrame(rows, schema)
    import pandas as pd

    names = [f.name for f in schema.fields]
    pdf = pd.DataFrame.from_records(list(rows), columns=names)
    return spark.createDataFrame(pdf, schema)
