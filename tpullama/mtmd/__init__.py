"""Multimodal (mtmd) subsystem: vision encoders + projectors.

The TPU-native analog of the reference's tools/mtmd — a CLIP/SigLIP ViT
encoder (tools/mtmd/clip.cpp) run as a functional JAX program, mmproj
GGUF loading, image preprocessing (tools/mtmd/clip.cpp img_tool), and
the chunked text+media tokenizer (tools/mtmd/mtmd.cpp).
"""

from .clip import ClipModel, load_mmproj
from .mtmd import MtmdContext, MEDIA_MARKER, IMAGE_MARKER

__all__ = [
    "ClipModel",
    "load_mmproj",
    "MtmdContext",
    "MEDIA_MARKER",
    "IMAGE_MARKER",
]
