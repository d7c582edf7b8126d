from .safe_float import safe_float, safe_float_py
from .scalars import bucket_start, epoch_seconds, finite_guard

__all__ = [
    "safe_float",
    "safe_float_py",
    "bucket_start",
    "epoch_seconds",
    "finite_guard",
]
