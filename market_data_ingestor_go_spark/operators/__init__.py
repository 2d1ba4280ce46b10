from .latest import latest_per_key
from .enrich import enrich_exchange, authenticate, semi_join, anti_join

__all__ = [
    "latest_per_key",
    "enrich_exchange",
    "authenticate",
    "semi_join",
    "anti_join",
]
