"""GeoParquet `geo` footer interop: write, external-read, prune, external-write."""

import json

import numpy as np
import pytest

from incubator_sedona_spark.geom import wkb as W
from incubator_sedona_spark.sources.geoparquet import (
    GEO_KEY,
    read_geo_metadata,
    read_geoparquet,
    write_geoparquet,
)


def _zones_df(spark, n=40):
    rows = []
    for i in range(n):
        x = float((i % 8) * 10)
        y = float((i // 8) * 10)
        rows.append((i, x, bytearray(W.dumps(W.box(x, y, x + 5.0, y + 5.0)))))
    return spark.createDataFrame(rows, "zid int, x double, wkb binary")


def test_write_then_footer_metadata(spark, tmp_path):
    path = str(tmp_path / "geo_out")
    df = _zones_df(spark).repartition(4, "zid")
    write_geoparquet(df, path, geom_col="wkb", crs="EPSG:4326")
    metas = read_geo_metadata(path)
    assert len(metas) >= 1
    for m in metas.values():
        assert m["primary_column"] == "wkb"
        col = m["columns"]["wkb"]
        assert col["encoding"] == "WKB"
        assert len(col["bbox"]) == 4 and col["crs"] == "EPSG:4326"
    back, geom_col = read_geoparquet(spark, path)
    assert geom_col == "wkb"
    assert back.count() == 40


def test_file_level_bbox_pruning(spark, tmp_path):
    path = str(tmp_path / "geo_pruned")
    # range-partition by x so part files carry disjoint bbox ranges
    df = _zones_df(spark).repartitionByRange(4, "x")
    write_geoparquet(df, path, geom_col="wkb")
    all_df, _ = read_geoparquet(spark, path)
    pruned, _ = read_geoparquet(spark, path, bbox=(0.0, 0.0, 9.0, 100.0))
    assert pruned.count() < all_df.count()
    # pruning is file-level: every zone intersecting the window must survive
    got = {r.zid for r in pruned.collect()}
    expected = {i for i in range(40) if (i % 8) * 10 <= 9.0}
    assert expected <= got


def test_reads_externally_written_geoparquet(spark, tmp_path):
    # simulate a GDAL/GeoPandas writer: plain pyarrow file with `geo` footer
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = tmp_path / "external"
    path.mkdir()
    wkbs = [W.dumps(W.box(0.0, 0.0, 1.0, 1.0)), W.dumps(W.box(5.0, 5.0, 6.0, 6.0))]
    table = pa.table({"gid": [0, 1], "geometry": wkbs})
    meta = {
        GEO_KEY: json.dumps(
            {
                "version": "1.0.0",
                "primary_column": "geometry",
                "columns": {"geometry": {"encoding": "WKB", "geometry_types": ["Polygon"], "bbox": [0, 0, 6, 6]}},
            }
        ).encode()
    }
    pq.write_table(table.replace_schema_metadata(meta), str(path / "part-0.parquet"))
    df, geom_col = read_geoparquet(spark, str(path))
    assert geom_col == "geometry"
    assert df.count() == 2
    g = W.loads(bytes(df.orderBy("gid").first().geometry))
    assert g.bounds == (0.0, 0.0, 1.0, 1.0)
