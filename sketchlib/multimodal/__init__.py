"""Multimodal column plumbing: binary payload + typed metadata, batch decode
/ feature-extract scaffolding over mapInPandas."""

from .media import (  # noqa: F401
    MEDIA_META_SCHEMA,
    decode_image_stub,
    extract_media_features,
    frame_sample_plan,
    media_meta_col,
)
