"""DGK additively-homomorphic cryptosystem back-end (reference C14-C18).

Damgård–Geisler–Krøigaard encryption over Z_n* with small prime message space
u: c = g^m * h^r mod n. Host keygen uses Maurer provable primes (as the
reference's vendored C does); decryption replaces the reference's linear
65536-entry table scan with a hash-map lookup and offers the Pohlig–Hellman
discrete-log path as the alternative decryptor.
"""

from .dgk import DGKPublicKey, DGKPrivateKey, dgk_gen_keys, dgk_encrypt, dgk_decrypt
from .maurer import maurer, prime_prod
from .gdsa import gdsa_prime, get_invertible_num

__all__ = [
    "DGKPublicKey",
    "DGKPrivateKey",
    "dgk_gen_keys",
    "dgk_encrypt",
    "dgk_decrypt",
    "maurer",
    "prime_prod",
    "gdsa_prime",
    "get_invertible_num",
]
