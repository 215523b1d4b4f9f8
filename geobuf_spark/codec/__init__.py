from geobuf_spark.codec.core import (  # noqa: F401
    decode_feature,
    encode_feature,
    go_round7,
    read_frames,
    write_frames,
)
