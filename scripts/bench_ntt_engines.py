"""Contention-robust NTT engine A/B: best-of-many spaced windows.
The shared chip has a bursty neighbor (up to ~40x slowdowns for minutes);
report the best window and the spread."""
import sys, time
import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from pplp_tpu.ops.primes import Modulus, get_primes
from pplp_tpu.ops import ntt, ntt4
from pplp_tpu.ops.ntt_vmem import forward_vmem

N = 4096
L = 3
B = 256
moduli = [Modulus(q) for q in get_primes(30, L, N)]
rng = np.random.default_rng(0)
qs = np.array([m.value for m in moduli], np.uint64)[None, :, None]
x = jnp.asarray((rng.integers(0, 1 << 62, size=(B, L, N)).astype(np.uint64) % qs).astype(np.uint32))

def bench(label, fn, windows=8, iters=10):
    out = fn(x); jax.block_until_ready(out)
    times = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(x)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / iters)
        time.sleep(0.3)
    best = min(times)
    tr = B * L / best
    print(f"{label}: best {best*1e6:.0f} us  ({tr/1e6:.2f}M limb-transforms/s; "
          f"median {np.median(times)*1e6:.0f} us)")
    sys.stdout.flush()
    return best

tb_stage = ntt.build_tables(moduli, N, engine="stage")
bench("stage fwd", jax.jit(lambda a: ntt.forward(a, tb_stage)))

tb4 = ntt4.build_tables4(moduli, N)
bench("four fwd", jax.jit(lambda a: ntt4.forward4(a, tb4)))

bench("vmem fwd", jax.jit(lambda a: forward_vmem(a, tb4)))
