from . import dedup, mutations, relational, similarity, text

__all__ = ["dedup", "mutations", "relational", "similarity", "text"]
