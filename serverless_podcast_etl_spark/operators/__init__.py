from . import aggregates, dedup, joins, multimodal, similarity, windows

__all__ = ["aggregates", "dedup", "joins", "multimodal", "similarity", "windows"]
