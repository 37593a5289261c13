from . import alto, dedup, multimodal, similarity, textstats

__all__ = ["alto", "dedup", "multimodal", "similarity", "textstats"]
