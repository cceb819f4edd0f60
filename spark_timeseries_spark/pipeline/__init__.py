from . import clean, dedup, multimodal, packing, sampling, similarity, text

__all__ = ["clean", "dedup", "multimodal", "packing", "sampling", "similarity", "text"]
