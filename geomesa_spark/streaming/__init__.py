from geomesa_spark.streaming.upsert import (  # noqa: F401
    apply_changelog,
    expire_ttl,
    replay_state,
    upsert_stream,
)
