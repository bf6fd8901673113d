"""lsh_ray: Ray-Data-native near-duplicate detection engine."""

from lsh_ray.config import DEFAULT_CONFIG, PipelineConfig

__all__ = ["DEFAULT_CONFIG", "PipelineConfig"]
