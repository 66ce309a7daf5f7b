"""Host-side utilities: drawing overlays and video I/O."""

from . import visualization, video_io

__all__ = ["visualization", "video_io"]
