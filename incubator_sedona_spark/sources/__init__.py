from incubator_sedona_spark.sources.images import (  # noqa: F401
    decode_image,
    encode_image,
    phash64,
    psnr,
    decode_images_df,
    derived_lonlat_cols,
    phash_for_lonlat,
)
