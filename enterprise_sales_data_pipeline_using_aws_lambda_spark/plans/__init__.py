from .queries import QUERIES, ORACLES

__all__ = ["QUERIES", "ORACLES"]
