from . import clean, dedup, multimodal, similarity, text

__all__ = ["clean", "dedup", "multimodal", "similarity", "text"]
