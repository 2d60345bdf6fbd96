from dynaledger_spark.streaming.ingest import (  # noqa: F401
    events_stream,
    replay_as_batches,
    run_available_now,
    sessionize_stream,
    windowed_event_counts,
)
