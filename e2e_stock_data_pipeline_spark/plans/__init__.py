from .registry import REGISTRY, QuerySpec, query

__all__ = ["REGISTRY", "QuerySpec", "query"]
