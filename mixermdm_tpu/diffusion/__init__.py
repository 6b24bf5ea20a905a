from . import gaussian, schedule

__all__ = ["gaussian", "schedule"]
