from drug_target_discovery_spark.streaming.events import (  # noqa: F401
    dedup_events,
    sessionize_builtin,
    windowed_event_counts,
)
