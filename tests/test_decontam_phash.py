"""decontaminate / repetition_stats (pipeline/decontam.py) and
phash_dup_pairs (pipeline/dedup.py) — hand-computable fixtures; the
driver-gate oracles (doc_decontam, doc_repetition, image_phash_pairs) do
the at-scale exact checks."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from incubator_sedona_spark.pipeline import decontam as DC
from incubator_sedona_spark.pipeline.dedup import phash_dup_pairs


def test_decontaminate_flags_only_overlapping(spark):
    bench_text = "the quick brown fox jumps over the lazy dog near the river bank today"
    corpus = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    # contains the benchmark's first 13 words verbatim (punctuated)
                    "intro... The QUICK brown fox jumps over the lazy dog near the river bank! outro",
                    # shares only a 12-gram (one word changed at position 13)
                    "the quick brown fox jumps over the lazy dog near the river SHORE today",
                    "completely unrelated text with thirteen words or more in it for padding purposes",
                ],
            }
        )
    )
    bench = spark.createDataFrame(pd.DataFrame({"text": [bench_text]}))
    got = {r["doc_id"]: r["n_hits"] for r in DC.decontaminate(corpus, bench, n=13).collect()}
    assert set(got) == {1}
    assert got[1] >= 1


def test_decontaminate_n_hits_counts_distinct_grams(spark):
    # 15 shared tokens -> 3 distinct shared 13-grams
    text = " ".join(f"w{i}" for i in range(15))
    corpus = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": [text]}))
    bench = spark.createDataFrame(pd.DataFrame({"text": [text]}))
    got = DC.decontaminate(corpus, bench, n=13).collect()
    assert len(got) == 1 and got[0]["n_hits"] == 3


def test_repetition_stats_hand_computed(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "a b a b a b",          # top bigram 'a b' x3, 6 tokens
                    "x y z\nx y z\nw w w",  # 2 dup lines of 3; dup tokens
                    "one",                   # single token: dropped
                ],
            }
        )
    )
    got = {r["doc_id"]: r for r in DC.repetition_stats(df).collect()}
    assert set(got) == {1, 2}
    r1 = got[1]
    assert r1["n_tokens"] == 6
    assert r1["dup_token_frac"] == pytest.approx(1 - 2 / 6)
    assert r1["dup_line_frac"] == 0.0
    assert r1["top_bigram"] == "a b"
    assert r1["top_bigram_frac"] == pytest.approx(2 * 3 / 6)
    r2 = got[2]
    assert r2["n_tokens"] == 9
    assert r2["dup_line_frac"] == pytest.approx(1 - 2 / 3)
    assert r2["dup_token_frac"] == pytest.approx(1 - 4 / 9)
    # 'w w' x2 beats 'x y' x2 on count tie? no — counts: 'x y' 2, 'y z' 2,
    # 'z x' 1, 'w w' 2 -> tie on 2, lexicographic min wins: 'w w'
    assert r2["top_bigram"] == "w w"


def test_phash_pairs_match_brute_force(spark):
    rng = np.random.RandomState(3)
    base = rng.randint(0, 1 << 60, 300, dtype=np.int64)
    ph = list(base)
    # plant mutations at every hamming distance 1..6 (only <=4 must pair)
    for b, ham in zip(base[:6], [1, 2, 3, 4, 5, 6]):
        m = b
        for bit in range(ham):
            m ^= np.int64(1) << np.int64(7 * bit)
        ph.append(m)
    ids = list(range(len(ph)))
    df = spark.createDataFrame(pd.DataFrame({"image_id": ids, "phash": ph}))
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in phash_dup_pairs(df, max_hamming=4).collect()
    }
    # brute force
    arr = np.array(ph, dtype=np.uint64)
    expect = set()
    for i in range(len(arr)):
        for j in range(i + 1, len(arr)):
            d = bin(int(arr[i]) ^ int(arr[j])).count("1")
            if d <= 4:
                expect.add((i, j, d))
    assert got == expect
    assert len(expect) >= 4  # the planted 1..4-bit mutations all paired


def test_phash_pigeonhole_guard():
    # n_bands <= max_hamming cannot guarantee recall: loud before any plan
    with pytest.raises(ValueError, match="pigeonhole"):
        phash_dup_pairs(None, max_hamming=4, n_bands=4)


def test_phash_bucket_cap(spark):
    # 50 identical hashes: uncapped -> 1225 pairs; capped buckets drop some
    df = spark.createDataFrame(
        pd.DataFrame({"image_id": range(50), "phash": [12345] * 50})
    )
    full = phash_dup_pairs(df, max_hamming=0).count()
    assert full == 49 * 50 // 2
    capped = phash_dup_pairs(df, max_hamming=0, max_bucket_size=10).count()
    assert capped < full


def test_decontaminate_plan_broadcasts_benchmark(spark):
    """Scale assertion: the benchmark side must enter as a broadcast hash
    join (no corpus-side shuffle before the join)."""
    import pandas as pd

    corpus = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(10), "text": ["alpha beta " * 10] * 10})
    )
    bench = spark.createDataFrame(pd.DataFrame({"text": ["alpha beta " * 10]}))
    plan = DC.decontaminate(corpus, bench, n=5)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan
    # exactly three hash Exchanges, all on SMALL relations: the BENCHMARK
    # side's distinct (tiny by design) and the two stages of the
    # count_distinct hit aggregation over the POST-JOIN contaminated
    # subset.  The corpus scan itself must flow into the broadcast join
    # shuffle-free (per-doc gram dedup is row-local array_distinct) — the
    # stream-side subtree of the join (the ':-' lines) carries no Exchange.
    assert plan.count("Exchange hashpartitioning") == 3, plan
    stream_side = [
        ln for ln in plan.split("BroadcastHashJoin", 1)[1].splitlines()
        if ln.strip().startswith(":")
    ]
    assert stream_side and not any("Exchange" in ln for ln in stream_side), plan


def test_phash_plan_is_python_free(spark):
    """The whole banded candidate+verify pipeline is built-ins only: the
    executed plan must contain no Python/Arrow eval nodes."""
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame({"image_id": range(20), "phash": range(100, 120)})
    )
    plan = phash_dup_pairs(df)._jdf.queryExecution().executedPlan().toString()
    for bad in ("BatchEvalPython", "ArrowEvalPython", "FlatMapsInPandas", "MapInPandas"):
        assert bad not in plan, plan


# -- winnowing / exact-substring dedup ------------------------------------------


def test_winnowing_guarantee_and_specificity(spark):
    """MOSS guarantee: documents sharing an exact substring of length
    >= min_len MUST pair; disjoint-content documents must not."""
    from incubator_sedona_spark.pipeline.dedup import substring_dup_pairs

    shared = "the quick brown fox jumps over the lazy dog!"  # 45 chars
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "AAAA " + shared + " BBBB",
                "CCCCCCC " + shared + " DD",
                "entirely different material with zero overlap at all whatsoever",
                "xy",  # under min_len: contributes nothing
            ],
        }
    )
    got = {
        (r.id_a, r.id_b)
        for r in substring_dup_pairs(
            spark.createDataFrame(docs), min_len=40, k=12
        ).collect()
    }
    assert (1, 2) in got
    assert not any(3 in p or 4 in p for p in got)


def test_winnowing_matches_duckdb_replay(spark):
    """The md5-prefix winnowing arithmetic replays byte-identically in
    DuckDB (the cross-engine property the gate oracle relies on)."""
    import duckdb

    from incubator_sedona_spark.pipeline.dedup import substring_dup_pairs

    rng = np.random.RandomState(8)
    words = ["alpha", "beta", "gamma", "delta", "epsilon"]
    docs = pd.DataFrame(
        {
            "doc_id": range(30),
            "text": [
                " ".join(words[i] for i in rng.randint(0, 5, 30)) for _ in range(30)
            ],
        }
    )
    spark_pairs = {
        (r.id_a, r.id_b, r.n_shared_fp)
        for r in substring_dup_pairs(
            spark.createDataFrame(docs), min_len=20, k=8
        ).collect()
    }
    con = duckdb.connect()
    con.register("d", docs)
    duck_pairs = set(
        map(
            tuple,
            con.execute(
                """
        WITH fp AS (
          SELECT doc_id, fp FROM (
            SELECT doc_id, list_distinct(list_transform(
              generate_series(1, greatest(0, length(text) - 8 + 1 - 13 + 1)),
              j -> list_min(list_transform(generate_series(j, j + 12),
                   i -> ('0x' || substr(md5(substr(text, i, 8)), 1, 15))::BIGINT))
            )) AS fps FROM d WHERE length(text) >= 20
          ), UNNEST(fps) AS u(fp)
        )
        SELECT a.doc_id, b.doc_id, count(*) FROM fp a
        JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id GROUP BY 1, 2
        """
            ).fetchall(),
        )
    )
    assert spark_pairs == duck_pairs and len(spark_pairs) > 0


def test_winnowing_min_len_guard():
    from incubator_sedona_spark.pipeline.dedup import substring_dup_pairs

    with pytest.raises(ValueError, match="min_len"):
        substring_dup_pairs(None, min_len=5, k=8)


def test_winnowing_no_false_pairs_for_short_texts(spark):
    """Regression: Spark's sequence(1, 0) is [1, 0] (descending, not
    empty) — sub-k texts must not fabricate whole-text fingerprints and
    falsely pair (found by review, confirmed by execution)."""
    from incubator_sedona_spark.pipeline.dedup import substring_dup_pairs

    docs = pd.DataFrame({"doc_id": [1, 2, 3], "text": ["hi", "hi", "hello!!"]})
    got = substring_dup_pairs(
        spark.createDataFrame(docs), min_len=9, k=8
    ).collect()
    assert got == []


def test_decontaminate_duplicate_corpus_rows_do_not_double_count(spark):
    """Regression: a duplicated corpus row for one doc_id (upstream union
    re-reading a partition) must not inflate n_hits."""
    text = " ".join(f"w{i}" for i in range(15))
    corpus = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 1], "text": [text, text]})
    )
    bench = spark.createDataFrame(pd.DataFrame({"text": [text]}))
    got = DC.decontaminate(corpus, bench, n=13).collect()
    assert len(got) == 1 and got[0]["n_hits"] == 3  # not 6
