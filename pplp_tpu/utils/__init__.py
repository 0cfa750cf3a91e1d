"""Host utilities: hex codec, bit length, CSV writer, CLI parsing."""

from .hexcodec import uint64_to_hex_string, hex_string_to_uint, get_bitlen

__all__ = ["uint64_to_hex_string", "hex_string_to_uint", "get_bitlen"]
