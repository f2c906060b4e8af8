"""S7: mapfile CSV/TSV source with the reference's strict validation
(warcit/warcit.py:271-306).

Rules: dialect by extension (.tsv -> tab, else comma); header vocabulary is
exactly {file, URL, timestamp, Content-Type}; unknown columns are errors;
``file`` is mandatory; at least one other column required.  The loaded
table is small by construction and is broadcast at the join (J1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

ALLOWED_COLUMNS = ["file", "URL", "Content-Type", "timestamp"]


class MapfileValidationError(ValueError):
    pass


def read_mapfile(spark: SparkSession, path: str) -> DataFrame:
    sep = "\t" if path.lower().endswith(".tsv") else ","
    df = (
        spark.read.option("header", True)
        .option("sep", sep)
        .option("inferSchema", False)
        .csv(path)
    )
    for column in df.columns:
        if column not in ALLOWED_COLUMNS:
            raise MapfileValidationError(f'Unknown column "{column}" in mapfile.')
    if "file" not in df.columns:
        raise MapfileValidationError('Missing "file" column in mapfile.')
    if not len(df.columns) > 1:
        raise MapfileValidationError(
            'Mapfile needs one other column in addition to "file".'
        )
    return df
