from . import dedup, multimodal, relational, similarity, textanalysis

__all__ = ["dedup", "multimodal", "relational", "similarity", "textanalysis"]
