from . import clean, dedup, multimodal, sampling, similarity, text

__all__ = ["clean", "dedup", "multimodal", "sampling", "similarity", "text"]
