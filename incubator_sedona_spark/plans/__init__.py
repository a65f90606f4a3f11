from incubator_sedona_spark.plans.checkpoint import (  # noqa: F401
    CheckpointedRun,
    run_partitioned_with_checkpoints,
)
from incubator_sedona_spark.plans.metrics import cell_metrics  # noqa: F401
