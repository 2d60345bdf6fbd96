"""Streaming SEC ingest: the reference's poll-and-branch pattern as a
file-source stream.

The reference discovers new quarters by listing S3 prefixes and branching
(s3_data_checker.py:7-14, load_json_data_snowflake.py:30-59,
dft_data_flow_dag.py:88-93); each run then re-ingests a whole quarter.
The streaming form subsumes all of that: TSV files land in a directory,
`Trigger.AvailableNow` drains whatever is new, the checkpoint's file log
makes ingestion exactly-once per file, and typed parquet appends
accumulate the table — no probe, no branch, no re-ingest.

Scale posture: the file source lists names only; each microbatch is a
normal parallel TSV scan with the same explicit schema + try_cast
coercion as the batch path (sources/tsv.py), so batch and streaming
ingest cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def sec_tsv_stream(
    spark: SparkSession,
    landing_dir: str,
    schema: T.StructType,
    source_file: str | None = None,
) -> DataFrame:
    """Stream TSV files from a landing dir with the batch path's typing.

    All columns read as string then try_cast per the declared schema —
    identical coercion to sources/tsv.py:read_tsv (malformed → null,
    never a failed load; the reference's ON_ERROR=CONTINUE).
    """
    raw_schema = T.StructType(
        [T.StructField(f.name, T.StringType()) for f in schema.fields if f.name != "source_file"]
    )
    df = (
        spark.readStream.schema(raw_schema)
        .option("sep", "\t")
        .option("header", "true")
        .csv(landing_dir)
    )
    cols = [
        F.col(f.name).try_cast(f.dataType).alias(f.name)
        if not isinstance(f.dataType, T.StringType)
        else F.col(f.name)
        for f in schema.fields
        if f.name != "source_file"
    ]
    out = df.select(*cols)
    if source_file is not None:
        out = out.withColumn("source_file", F.lit(source_file))
    elif "source_file" in [f.name for f in schema.fields]:
        # derive the quarter tag from the landing path: .../{YYYY}Q{n}/xxx.txt
        out = out.withColumn(
            "source_file",
            F.regexp_extract(F.input_file_name(), r"(\d{4}Q\d)", 1),
        )
    return out


def run_ingest(
    stream_df: DataFrame, table_path: str, checkpoint_dir: str
) -> None:
    """Drain all new files into a parquet table, exactly-once per file.

    Re-running after new files land appends only the new data (the
    checkpoint file log remembers what was read); re-running with no new
    files is a no-op — the property the reference approximated with
    existence probes and manual branches.
    """
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", table_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
