from . import scalar, text, vector

__all__ = ["scalar", "text", "vector"]
