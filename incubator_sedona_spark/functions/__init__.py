from incubator_sedona_spark.functions.st import *  # noqa: F401,F403
