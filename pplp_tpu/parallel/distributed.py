"""Multi-host setup (SURVEY.md §2: multi-host pod runs one role's compute).

The reference's "cluster" story is two processes on a TCP socket plus an frp
tunnel (README.md:62-68). Here, one protocol role can span a multi-host TPU
pod slice: ``jax.distributed`` coordinates the hosts over DCN, device
collectives ride ICI, and the role-to-role link stays the framed TCP channel.

Usage on each host of a slice:

    from pplp_tpu.parallel.distributed import initialize_multihost, global_mesh
    initialize_multihost(coordinator="10.0.0.1:8476", num_processes=2,
                         process_id=<rank>)
    mesh = global_mesh()            # dp x limb x coeff over ALL devices

Tested single-host via the 8-device virtual CPU mesh (tests/test_parallel.py)
and the driver's ``dryrun_multichip``; real multi-host wiring is env-driven.
"""

from __future__ import annotations

import jax

from .mesh import factor_devices, make_mesh

__all__ = ["initialize_multihost", "global_mesh", "local_batch_slice"]


def initialize_multihost(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
):
    """jax.distributed.initialize with explicit or env-provided topology."""
    kwargs = {}
    if coordinator is not None:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def global_mesh(dp=None, limb=None, coeff=None):
    """Mesh over every device in the (possibly multi-host) runtime."""
    devices = jax.devices()
    if dp is None or limb is None or coeff is None:
        dp, limb, coeff = factor_devices(len(devices))
    return make_mesh(devices, dp, limb, coeff)


def local_batch_slice(global_batch: int, mesh) -> slice:
    """The [start, stop) batch rows this process feeds into a dp-sharded
    global array (jax.make_array_from_process_local_data helper)."""
    nproc = jax.process_count()
    per = global_batch // nproc
    pid = jax.process_index()
    return slice(pid * per, (pid + 1) * per)
