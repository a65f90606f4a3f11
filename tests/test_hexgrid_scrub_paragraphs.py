"""Round-5 (continued) additions: hex-grid indexing (H3 analog), PII
scrubbing, and CCNet-style paragraph dedup."""

import math
import random

import duckdb
import pytest
from pyspark.sql import functions as F

from incubator_sedona_spark.functions import hexgrid as HX
from incubator_sedona_spark.pipeline.paragraphs import paragraph_dedup
from incubator_sedona_spark.pipeline.scrub import (
    pii_count_cols,
    pii_sql_exprs,
    scrub_pii,
    scrub_pii_col,
)


# ---------------------------------------------------------------- hexgrid

def _center(q: int, r: int, size: float) -> tuple[float, float]:
    return (size * HX.SQRT3 * (q + r / 2.0), size * 1.5 * r)


def test_hex_spark_matches_python_twin(spark):
    rnd = random.Random(42)
    pts = [(i, rnd.uniform(-50.0, 150.0), rnd.uniform(-50.0, 150.0)) for i in range(500)]
    df = spark.createDataFrame(pts, "id long, x double, y double")
    q, r = HX.hex_qr_cols(F.col("x"), F.col("y"), 7.0)
    got = {
        row["id"]: (row["q"], row["r"])
        for row in df.select("id", q.alias("q"), r.alias("r")).collect()
    }
    for i, x, y in pts:
        assert got[i] == HX.hex_qr_py(x, y, 7.0), (i, x, y)


def test_hex_duckdb_sql_replays_assignment():
    """hex_qr_sql (the oracle form) == the python twin on 1000 hashed points."""
    con = duckdb.connect()
    qs, rs = HX.hex_qr_sql("x", "y", 3.0)
    rows = con.execute(
        f"""
        SELECT x, y, {qs} AS q, {rs} AS r FROM (
          SELECT (i * 2654435761 % 4294967296) / 4294967296.0 * 100.0 AS x,
                 ((i + 7919) * 2246822519 % 4294967296) / 4294967296.0 * 100.0 AS y
          FROM range(1000) t(i))
        """
    ).fetchall()
    assert len(rows) == 1000
    for x, y, q, r in rows:
        assert (q, r) == HX.hex_qr_py(x, y, 3.0), (x, y)


def test_hex_assignment_is_nearest_center():
    """The defining Voronoi property of a hex lattice: the assigned cell's
    center is the nearest center (checked against the whole 2-disk)."""
    rnd = random.Random(7)
    for _ in range(400):
        x, y = rnd.uniform(-20.0, 20.0), rnd.uniform(-20.0, 20.0)
        q, r = HX.hex_qr_py(x, y, 2.0)
        cx, cy = _center(q, r, 2.0)
        d0 = (x - cx) ** 2 + (y - cy) ** 2
        for dq, dr in HX.hex_disk_offsets(2):
            if (dq, dr) == (0, 0):
                continue
            nx, ny = _center(q + dq, r + dr, 2.0)
            assert d0 <= (x - nx) ** 2 + (y - ny) ** 2 + 1e-9, (x, y, dq, dr)


def test_hex_center_roundtrips_to_own_cell(spark):
    cells = [(q, r) for q in range(-6, 7) for r in range(-6, 7)]
    df = spark.createDataFrame(cells, "q long, r long")
    cx, cy = HX.hex_center_cols(F.col("q"), F.col("r"), 4.0)
    q2, r2 = HX.hex_qr_cols(cx, cy, 4.0)
    bad = df.where((F.col("q") != q2) | (F.col("r") != r2)).count()
    assert bad == 0


def test_hex_disk_offsets_counts_and_radius():
    assert HX.hex_disk_offsets(0) == [(0, 0)]
    for k in (1, 2, 3, 5):
        offs = HX.hex_disk_offsets(k)
        assert len(offs) == 1 + 3 * k * (k + 1)
        assert len(set(offs)) == len(offs)
        dist = lambda dq, dr: (abs(dq) + abs(dr) + abs(dq + dr)) // 2  # noqa: E731
        assert all(dist(dq, dr) <= k for dq, dr in offs)
        assert sum(1 for dq, dr in offs if dist(dq, dr) == k) == 6 * k
    with pytest.raises(ValueError):
        HX.hex_disk_offsets(-1)


def test_hex_distance_and_disk_cells_agree(spark):
    """Every cell in the k-disk is at hex_distance <= k from the center,
    and the disk has the closed-form cardinality."""
    df = spark.createDataFrame([(2, -1)], "q long, r long")
    k = 2
    out = df.select(
        F.explode(HX.hex_disk_cells_col(F.col("q"), F.col("r"), k)).alias("c"),
        F.col("q"),
        F.col("r"),
    ).select(
        HX.hex_distance_col(
            F.col("c.q"), F.col("c.r"), F.col("q"), F.col("r")
        ).alias("d")
    )
    rows = [row["d"] for row in out.collect()]
    assert len(rows) == 1 + 3 * k * (k + 1)
    assert max(rows) == k and min(rows) == 0


def test_hex_cell_id_bijective(spark):
    cells = [(q, r) for q in range(-20, 21, 3) for r in range(-20, 21, 3)]
    df = spark.createDataFrame(cells, "q long, r long")
    n = df.select(HX.hex_cell_id_col(F.col("q"), F.col("r")).alias("i")).distinct().count()
    assert n == len(cells)
    ids = df.select(HX.hex_cell_id_col(F.col("q"), F.col("r")).alias("i")).agg(
        F.min("i"), F.max("i")
    ).first()
    assert ids[0] >= 0


# ----------------------------------------------------------------- scrub

_GOLDEN = [
    (1, "mail john.doe+x@sub.example.co.uk or a@b.io now", 2, 0, 0),
    (2, "call +1-555-4567 or +44 123 9999 backup +359.100.0001", 0, 3, 0),
    (3, "host 192.168.0.1 and 999.999.999.999 overflow ok", 0, 0, 2),
    (4, "version v1.2.3.4 is NOT an ip (no word boundary)", 0, 0, 0),
    (5, "quad run 1.2.3.4.5 scrubs the leading quad", 0, 0, 1),
    (6, "clean text with nothing to hide", 0, 0, 0),
    (7, "u@x.io +1-555-0000 10.0.0.1 all three", 1, 1, 1),
]


def test_scrub_pii_goldens(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t, *_ in _GOLDEN], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in scrub_pii(df).collect()}
    for i, _t, ne, np_, ni in _GOLDEN:
        r = out[i]
        assert (r["n_email"], r["n_phone"], r["n_ip"]) == (ne, np_, ni), i
    assert out[7]["text"] == "<EMAIL> <PHONE> <IP> all three"
    assert out[5]["text"] == "quad run <IP>.5 scrubs the leading quad"
    assert out[4]["text"] == "version v1.2.3.4 is NOT an ip (no word boundary)"
    assert out[1]["text"] == "mail <EMAIL> or <EMAIL> now"


def test_scrub_is_idempotent_and_plan_is_project_only(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t, *_ in _GOLDEN], "doc_id long, text string"
    )
    once = scrub_pii(df).select("doc_id", "text")
    twice = once.select("doc_id", scrub_pii_col(F.col("text")).alias("text"))
    assert sorted(once.collect()) == sorted(twice.collect())
    plan = scrub_pii(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_scrub_duckdb_twin_matches(spark):
    """Same pattern strings through Java regex (Spark) and RE2 (DuckDB)."""
    df = spark.createDataFrame(
        [(i, t) for i, t, *_ in _GOLDEN], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_email"], r["n_phone"], r["n_ip"], r["text"])
        for r in scrub_pii(df).collect()
    }
    con = duckdb.connect()
    e = pii_sql_exprs("t")
    for i, t, *_ in _GOLDEN:
        row = con.execute(
            f"SELECT {e['n_email']}, {e['n_phone']}, {e['n_ip']}, {e['scrubbed']} "
            "FROM (SELECT ? AS t)",
            [t],
        ).fetchone()
        assert tuple(row) == got[i], i


# ------------------------------------------------------------- paragraphs

def test_paragraph_dedup_newline_mode(spark):
    docs = [
        (1, "intro one\nSHARED BOILER\nbody a"),
        (2, " SHARED BOILER \nbody b\n\nbody b2"),
        (3, "SHARED BOILER"),
        (4, ""),
        (5, "body b\nfresh five"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in paragraph_dedup(df).collect()}
    assert (out[1]["n_total"], out[1]["n_kept"]) == (3, 3)
    assert out[1]["kept_text"] == "intro one\nSHARED BOILER\nbody a"
    # doc 2 loses the boilerplate (canonical copy lives at (1, 1))
    assert (out[2]["n_total"], out[2]["n_kept"]) == (3, 2)
    assert out[2]["kept_text"] == "body b\nbody b2"
    assert (out[3]["n_total"], out[3]["n_kept"], out[3]["kept_text"]) == (1, 0, "")
    assert (out[4]["n_total"], out[4]["n_kept"], out[4]["kept_text"]) == (0, 0, "")
    # doc 5's 'body b' lost to doc 2's earlier instance
    assert out[5]["kept_text"] == "fresh five"


def test_paragraph_dedup_chunk_mode_and_partition_invariance(spark):
    docs = [
        (10, "a b c d e f"),
        (11, "c d x y"),
        (12, "a b"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in paragraph_dedup(
            df, split_re=None, chunk_tokens=2, joiner=" "
        ).collect()
    }
    assert out[10]["kept_text"] == "a b c d e f"
    assert (out[11]["n_total"], out[11]["n_kept"]) == (2, 1)
    assert out[11]["kept_text"] == "x y"
    assert (out[12]["n_kept"], out[12]["kept_text"]) == (0, "")
    # keeper rule is a pure function of content — partitioning must not matter
    out7 = {
        r["doc_id"]: r
        for r in paragraph_dedup(
            df.repartition(7), split_re=None, chunk_tokens=2, joiner=" "
        ).collect()
    }
    for k in out:
        assert out[k] == out7[k]


def test_paragraph_dedup_arg_validation(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        paragraph_dedup(df, split_re=None, chunk_tokens=None)
    with pytest.raises(ValueError):
        paragraph_dedup(df, split_re=r"\n+", chunk_tokens=4)
    with pytest.raises(ValueError):
        paragraph_dedup(df, split_re=None, chunk_tokens=0)
