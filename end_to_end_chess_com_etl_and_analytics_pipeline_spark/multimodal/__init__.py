from .media import (  # noqa: F401
    MEDIA_FEATURE_SCHEMA,
    attach_binary_payload,
    decode_image_stub,
    extract_media_features,
)
