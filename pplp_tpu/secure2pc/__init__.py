"""2PC geometric predicates (reference C19-C22, ``src/aby/*``).

Reproduces the four ABY example computations — circle (squared-distance <
r^2) and point-in-convex-polygon (half-plane orientation tests + OR-fold), in
both arithmetic-sharing and boolean-boundary variants — together with the
clear-computation verification oracle the reference prints
("Circuit Result" vs "Local Verify Result", circ_y/pplp.cpp:97-101).

Scope (SURVEY.md §7.8): the predicate circuits and additive secret sharing
with Beaver-triple multiplication are real and batched on device; the
garbled-circuit/OT transport of ABY is modeled by evaluating comparison gates
at the share-reconstruction boundary (the A2Y conversion point), not by a
garbling stack.
"""

from .sharing import ArithShare, BeaverDealer, share, reconstruct
from .circuits import (
    circle_predicate_2pc,
    circle_predicate_clear,
    polygon_predicate_2pc,
    polygon_predicate_clear,
    polygon_edge_coeffs,
)

__all__ = [
    "ArithShare",
    "BeaverDealer",
    "share",
    "reconstruct",
    "circle_predicate_2pc",
    "circle_predicate_clear",
    "polygon_predicate_2pc",
    "polygon_predicate_clear",
    "polygon_edge_coeffs",
]
