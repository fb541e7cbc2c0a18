from .hashing import (
    portable_hash64,
    portable_hash64_sql,
    hash_bucket,
    hash_bucket_sql,
)
from .numeric import dec_sum, dec_avg

__all__ = [
    "portable_hash64",
    "portable_hash64_sql",
    "hash_bucket",
    "hash_bucket_sql",
    "dec_sum",
    "dec_avg",
]
