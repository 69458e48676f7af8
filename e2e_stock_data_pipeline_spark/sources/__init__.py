from .tables import TABLE_NAMES, load, load_all

__all__ = ["TABLE_NAMES", "load", "load_all"]
