"""Single-process demo: both roles in one process (the reference's ``./pplp``).

Reproduces the flow and printed output of ``/root/reference/src/demo.cc:21-178``
— BF build, encryption, homomorphic blind distance, decrypt, membership test,
wall-clock report — with per-stage timings collected for the benchmark harness.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from .config import ProtocolConfig
from .roles import ProximityClient, ProximityServer

__all__ = ["DemoResult", "run_local_demo"]


@dataclass
class DemoResult:
    is_near: bool
    blind_distance: int
    elapsed_s: float
    stage_ns: dict = field(default_factory=dict)

    @property
    def verdict(self) -> str:
        return "near" if self.is_near else "far"


def run_local_demo(
    cfg: ProtocolConfig | None = None, verbose: bool = True, print_bf: bool = False
) -> DemoResult:
    cfg = cfg or ProtocolConfig()
    log = print if verbose else (lambda *a, **k: None)
    log(f"Client's coordinates:\t({cfg.xa}, {cfg.ya})")
    log(f"Server's coordinates:\t({cfg.xb}, {cfg.yb})")
    log(f"Radius(Threshold):\t\t\t{cfg.radius}")

    stage_ns = {}

    def timed(name):
        class _T:
            def __enter__(self):
                self.t0 = time.perf_counter_ns()

            def __exit__(self, *exc):
                stage_ns[name] = time.perf_counter_ns() - self.t0

        return _T()

    begin = time.perf_counter_ns()

    client = ProximityClient(cfg)
    server = ProximityServer(cfg)

    with timed("setParms"):
        server.receive_parms(client.parms_message())
    with timed("kGen"):
        client.keygen()
    with timed("setBF"):
        server.build_bloom_filter()
    if print_bf:  # demo.cc:123-124: print each blinded distance in hex
        bl = server.blinding
        log(" ".join(
            format(bl.s * (di + bl.r) & ((1 << 64) - 1), "x")
            for di in range(cfg.sq_radius)
        ))
        log(format(bl.r * bl.s & ((1 << 64) - 1), "x"))  # demo.cc:128
    with timed("enc"):
        blobs = client.ciphertext_messages()
    with timed("homoCalc"):
        server.receive_ciphertexts(blobs)
        bd_blob = server.blind_distance_message()
    with timed("dec"):
        client.receive_bf(server.bf_message())
        is_near = client.receive_blind_distance(bd_blob)

    elapsed = (time.perf_counter_ns() - begin) * 1e-9
    log(f"blind_distance: {client.blind_distance:x}")
    log("near" if is_near else "far")
    log(f"Time measured: {elapsed:.3f} seconds.")
    return DemoResult(
        is_near=is_near,
        blind_distance=client.blind_distance,
        elapsed_s=elapsed,
        stage_ns=stage_ns,
    )
