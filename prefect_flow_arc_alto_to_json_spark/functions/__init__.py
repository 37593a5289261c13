from .scalar import (
    basename,
    js_parse_int,
    stable_hash64,
    stable_hash_p31,
    stable_hash_u32,
    token_array,
)

__all__ = [
    "basename",
    "js_parse_int",
    "stable_hash64",
    "stable_hash_p31",
    "stable_hash_u32",
    "token_array",
]
