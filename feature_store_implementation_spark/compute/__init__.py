from .engine import compute_feature, register_transform, TRANSFORMS

__all__ = ["compute_feature", "register_transform", "TRANSFORMS"]
