from .market import (
    MARKET_DATA_SCHEMA,
    PAYLOAD_SCHEMA,
    decode_payload,
    flatten,
    hash_api_key,
    to_wire_json,
    validate,
)

__all__ = [
    "MARKET_DATA_SCHEMA",
    "PAYLOAD_SCHEMA",
    "decode_payload",
    "flatten",
    "hash_api_key",
    "to_wire_json",
    "validate",
]
