from .queries import QUERIES
from .oracles import ORACLES

__all__ = ["QUERIES", "ORACLES"]
