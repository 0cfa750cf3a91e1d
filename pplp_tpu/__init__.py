"""pplp_tpu — TPU-native privacy-preserving location proximity framework.

A from-scratch JAX/Pallas reimplementation of the capabilities of the C++
reference ``phanen/pplp`` (see SURVEY.md): a BFV homomorphic-encryption engine
(RNS limb arithmetic over 32-bit lanes, negacyclic NTT/INTT, keygen, encrypt,
evaluate, decrypt), the blinded-squared-distance + Bloom-filter proximity
protocol with its two-party wire format, a DGK additively-homomorphic
comparison back-end, 2PC geometric predicates, and the radius-sweep CSV
benchmark harness.

The compute core is JAX/XLA/Pallas; everything modular-arithmetic-hot runs on
integer vector lanes as 32-bit limb kernels (the TPU has no 64-bit multiplier).
"""

__version__ = "0.1.0"
