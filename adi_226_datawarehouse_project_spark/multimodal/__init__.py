from .binary_ops import (
    attach_binary_payload,
    decode_image_stub,
    extract_binary_features,
    sample_frames_stub,
)

__all__ = [
    "attach_binary_payload",
    "decode_image_stub",
    "extract_binary_features",
    "sample_frames_stub",
]
