from dynaledger_spark.streaming.ingest import (  # noqa: F401
    events_stream,
    replay_as_batches,
    run_available_now,
    run_upsert_materialize,
    sessionize_stream,
    stream_stream_attribution,
    windowed_event_counts,
)
from dynaledger_spark.streaming.sec_ingest import (  # noqa: F401
    run_ingest,
    sec_tsv_stream,
)
