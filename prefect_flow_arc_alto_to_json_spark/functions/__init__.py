from .scalar import basename, js_parse_int, stable_hash64, token_array

__all__ = ["basename", "js_parse_int", "stable_hash64", "token_array"]
