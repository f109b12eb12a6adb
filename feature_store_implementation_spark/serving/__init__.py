from .cache import FeatureCache
from .vectors import FeatureStore

__all__ = ["FeatureCache", "FeatureStore"]
