from legate_pandas_spark.streaming.events import (  # noqa: F401
    stream_events,
    windowed_event_counts,
    windowed_distinct_users,
    sessionized_event_stats,
    dedup_stream,
    stateful_first_last_reading,
    stateful_running_totals,
    topk_event_type_leaderboard,
    purchase_click_attribution,
    run_available_now,
)
from legate_pandas_spark.streaming.documents import (  # noqa: F401
    stream_documents,
    stream_embeddings,
    quality_scrub_stream,
    corpus_dedup_stream,
    bloom_dedup_stream,
    incremental_dedup_stream,
    pq_encode_stream,
    dsir_score_stream,
    gopher_filter_stream,
    dsir_model_counts_stream,
)
