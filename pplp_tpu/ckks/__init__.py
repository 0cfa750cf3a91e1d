"""CKKS approximate-arithmetic scheme — the aggregation-demo capability
(reference C7, ``src/ckks_demo/``: a client/server pair summing encrypted ages
under CKKS; vestigial SEAL-3.x/Winsock code there, reimplemented here against
this framework's own RNS/NTT engine and transport).

Scope: encoder/decoder (canonical embedding via host FFT), keygen shared with
the BFV stack, encrypt / add / add_plain / decrypt — everything the
aggregation demo needs. Rescaling/multiplication are out of scope for parity
(the reference demo never multiplies).
"""

from .ckks import CKKSContext, CKKSEncoder, ckks_encrypt, ckks_decrypt, ckks_add
from .demo import run_aggregation_demo

__all__ = [
    "CKKSContext",
    "CKKSEncoder",
    "ckks_encrypt",
    "ckks_decrypt",
    "ckks_add",
    "run_aggregation_demo",
]
