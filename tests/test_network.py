"""Two-party networked protocol tests: both roles on 127.0.0.1 threads —
"distributed-without-a-cluster" exactly as the reference tests itself
(SURVEY.md §4.2)."""

import socket
import threading

import pytest

from pplp_tpu.benchmark.harness import DurationClient, DurationServer, TrafficLoad
from pplp_tpu.benchmark.sweep import (
    test_client_leg as bench_client_leg,
    test_client_opt as bench_client_opt,
    test_server_leg as bench_server_leg,
    test_server_opt as bench_server_opt,
)
from pplp_tpu.protocol.config import ProtocolConfig
from pplp_tpu.protocol.netmain import run_client_protocol, run_server_protocol
from pplp_tpu.protocol.transport import Channel


def channel_pair():
    a, b = socket.socketpair()
    return Channel(a), Channel(b)


def run_pair(client_fn, server_fn):
    ca, cb = channel_pair()
    out = {}
    err = []

    def srv():
        try:
            out["server"] = server_fn(cb)
        except Exception as e:  # pragma: no cover
            err.append(e)

    th = threading.Thread(target=srv)
    th.start()
    try:
        out["client"] = client_fn(ca)
    finally:
        th.join(timeout=120)
    assert not err, err
    return out


@pytest.mark.slow
def test_interactive_client_server_near_far():
    cfg_c = ProtocolConfig(
        xa=1234, ya=1212, radius=320,
        poly_modulus_degree_bits=12, plain_modulus_bits=40,
        profile="tpu", seed=42, false_positive_probability=1e-4,
    )
    cfg_s = ProtocolConfig(
        xb=1000, yb=1000, radius=320,
        poly_modulus_degree_bits=12, plain_modulus_bits=40,
        profile="tpu", seed=42, false_positive_probability=1e-4,
    )
    out = run_pair(
        lambda ch: run_client_protocol(ch, cfg_c, verbose=False),
        lambda ch: run_server_protocol(ch, cfg_s, verbose=False),
    )
    assert out["client"].is_near is True  # d^2 = 99680 < 320^2


@pytest.mark.parametrize("variant", ["leg", "opt"])
def test_benchmark_pair_produces_metrics(variant):
    radius = 32
    if variant == "leg":
        cfn = lambda ch: bench_client_leg(ch, radius, 1234, 1212, 12, 40, "tpu")
        sfn = lambda ch: bench_server_leg(ch, radius, 1000, 1000, "tpu")
    else:
        cfn = lambda ch: bench_client_opt(ch, radius, 1234, 1212, 12, 40, "tpu")
        sfn = lambda ch: bench_server_opt(ch, radius, 1000, 1000, "tpu")
    out = run_pair(cfn, sfn)
    traffic, dur = out["client"]
    sdur = out["server"]
    assert isinstance(traffic, TrafficLoad) and isinstance(dur, DurationClient)
    assert isinstance(sdur, DurationServer)
    assert traffic.c_total == traffic.c_totalSend + traffic.c_totalRecv
    assert traffic.c_sendCips > 0 and traffic.c_recvBF > 0 and traffic.c_recvBD > 0
    if variant == "leg":
        assert traffic.c_sendPk > 0
        assert sdur.d_recvPk >= 0
    else:
        assert traffic.c_sendPk == 0
    assert dur.d_total > 0 and dur.d_totalCalc > 0
    assert sdur.d_homoCalc > 0 and sdur.d_setBF > 0


def test_csv_schema_matches_reference(tmp_path):
    from pplp_tpu.benchmark.harness import (
        parse2csv_client_leg,
        parse2csv_server_opt,
    )

    f = tmp_path / "client_leg.csv"
    parse2csv_client_leg(str(f), 16, True, TrafficLoad(), DurationClient())
    parse2csv_client_leg(str(f), 32, False, TrafficLoad(), DurationClient())
    lines = f.read_text().strip().split("\n")
    assert lines[0] == (
        "radius,d_setParms,d_kGen,d_sendPk,d_sendParms,d_recvBF,d_enc,"
        "d_sendCip,d_recvBD,d_dec,d_stage1,d_stage2,d_stage3,d_total,"
        "d_totalCalc,d_totalTraffic,c_sendParms,c_sendPk,c_sendCips,"
        "c_recvBF,c_recvBD,c_totalSend,c_totalRecv,c_total"
    )
    assert len(lines) == 3 and lines[1].startswith("16,") and lines[2].startswith("32,")

    f2 = tmp_path / "server_opt.csv"
    parse2csv_server_opt(str(f2), 16, True, DurationServer())
    head = f2.read_text().split("\n", 1)[0]
    assert head == (
        "radius,d_recvParms,d_setParms,d_setBF,d_recvCips,d_homoCalc,"
        "d_sendBF,d_sendBD,d_stage1,d_stage2,d_stage3,d_total,"
        "d_totalTraffic,d_totalCalc"
    )


def test_cli_demo_smoke(capsys):
    from pplp_tpu.cli import main

    rc = main(
        [
            "demo", "-x", "100", "-y", "100", "-u", "120", "-v", "120",
            "-r", "40", "-b", "40", "-d", "12", "--profile", "tpu",
            "--seed", "3",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "near" in out and "Time measured" in out


def test_malformed_frame_header_rejected():
    import socket

    a, b = socket.socketpair()
    ch = Channel(b)
    a.sendall(b"notanumber".ljust(128, b"\x00"))
    with pytest.raises(ConnectionError, match="malformed frame header"):
        ch.recv_frame()
    a.close()
    b.close()

    a, b = socket.socketpair()
    ch = Channel(b)
    a.sendall(str(1 << 40).encode().ljust(128, b"\x00"))
    with pytest.raises(ConnectionError, match="exceeds cap"):
        ch.recv_frame()
    a.close()
    b.close()


def test_radius_negotiation_frame():
    """tc announces the sweep; ts iterates exactly that list."""
    from pplp_tpu.benchmark.sweep import _announce_radii, _recv_radii

    ca, cb = channel_pair()
    try:
        _announce_radii(ca, [16, 32, 64])
        assert _recv_radii(cb) == [16, 32, 64]
    finally:
        ca.close()
        cb.close()
