from incubator_sedona_spark.streaming.ops import (  # noqa: F401
    streaming_tile_counts,
    streaming_enrich,
)
