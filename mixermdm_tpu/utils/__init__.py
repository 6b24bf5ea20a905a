from . import alignment, constants, features, normalizer, quaternions, rotations

__all__ = [
    "alignment",
    "constants",
    "features",
    "normalizer",
    "quaternions",
    "rotations",
]
