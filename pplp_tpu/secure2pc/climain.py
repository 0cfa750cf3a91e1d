"""CLI driver for the two-party predicates — the ``mytest`` counterpart.

The reference builds one driver per ABY variant (src/aby/*/mytest.cpp:10-70,
flags -r role, -a address, -p port); here one subcommand covers all four:
``--circuit circle|poly`` x ``--compare open|yao`` (arith+open vs arith+Yao,
the circ_ay/poly_ay designs; the pure-Yao bug variants are test-only).

Role mapping follows ABY: role 0 = SERVER (listens; holds the second point /
the polygon), role 1 = CLIENT (connects; holds the query point)."""

from __future__ import annotations

import random
import sys

import numpy as np


def _parse_list(s: str) -> np.ndarray:
    return np.array([int(v) for v in s.split(",") if v], np.int64)


def twopc_main(args) -> int:
    from ..protocol.transport import connect_to_client, connect_to_server
    from . import ot
    from .circuits import polygon_edge_coeffs
    from .networked import (
        circle_predicate_2pc_networked,
        polygon_predicate_2pc_networked,
    )

    role = args.role
    if args.circuit == "poly" and role == 0:
        ax, ay = _parse_list(args.ax), _parse_list(args.ay)
        if len(ax) < 3 or len(ax) != len(ay):
            print("error: --circuit poly needs --ax/--ay with >= 3 "
                  "matching vertices", file=sys.stderr)
            return 2
    if role == 0:
        ch = connect_to_client("::" if args.ipv6 else "0.0.0.0", args.port,
                               ipv6=args.ipv6)
    else:
        ch = connect_to_server(args.address, args.port, ipv6=args.ipv6)

    # Both parties derive the same OT group deterministically (public parms).
    group = ot.SchnorrGroup.generate(pbits=args.otp_bits, qbits=160, seed=1)
    # None = production mode: every protocol draw uses SystemRandom
    # (os.urandom). Passing --seed switches to insecure reproducible MT19937
    # (testing only).
    seed = args.seed

    if args.circuit == "circle":
        thr_sq = args.radius * args.radius
        # networked role 0 = client/evaluator; CLI role 1 (CLIENT) maps there.
        net_role = 0 if role == 1 else 1
        res = circle_predicate_2pc_networked(
            ch, net_role, [args.x], [args.y], thr_sq, group,
            seed=seed, compare=args.compare,
        )
    else:
        if role == 0:
            edges = polygon_edge_coeffs(ax, ay)
            res = polygon_predicate_2pc_networked(
                ch, 1, edges=edges, group=group, seed=seed,
                compare=args.compare,
            )
        else:
            res = polygon_predicate_2pc_networked(
                ch, 0, point=([args.x], [args.y]), group=group, seed=seed,
                compare=args.compare,
            )
    verdict = "CLOSE" if bool(res[0]) else "FAR"
    print(f"Circuit Result: {verdict}", flush=True)
    ch.close()
    return 0
