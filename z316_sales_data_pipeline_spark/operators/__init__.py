from . import aggregates, dedup, joins, setops, similarity, windows

__all__ = ["aggregates", "dedup", "joins", "setops", "similarity", "windows"]
