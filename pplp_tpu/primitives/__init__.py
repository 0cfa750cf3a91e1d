"""Privacy primitives: Bloom filter, blinding, proximity key packing."""

from .bloom import BloomParameters, BloomFilter, CompressibleBloomFilter
from .blinding import Blinding, pack_key, blind_distance_keys

__all__ = [
    "BloomParameters",
    "BloomFilter",
    "CompressibleBloomFilter",
    "Blinding",
    "pack_key",
    "blind_distance_keys",
]
