from incubator_sedona_spark.operators.joins import (  # noqa: F401
    with_bbox,
    infer_grid,
    spatial_join,
    distance_join,
    range_query,
)
from incubator_sedona_spark.operators.knn import knn_query, knn_join  # noqa: F401
from incubator_sedona_spark.operators.tiling import tile_coordinate_cols, assign_tiles  # noqa: F401
