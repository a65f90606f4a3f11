import pytest

from incubator_sedona_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="iss-tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(autouse=True)
def _release_pins():
    """The engine pins intermediates (dedup band tables, kNN rounds, PPJoin
    ordered sets) in the shared session's storage; across a ~350-test run
    those accumulate and churn executor storage/GC.  Release after every
    test — no test depends on another test's pins."""
    yield
    try:
        from incubator_sedona_spark.pipeline.dedup import release_cached

        release_cached()
    except Exception:
        pass
