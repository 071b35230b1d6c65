from versatiles_rs_spark.multimodal.media import (  # noqa: F401
    decode_image_stub,
    extract_image_features,
    frame_sample_video,
    with_media_metadata,
)
