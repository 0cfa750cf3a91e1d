"""VPU op costs via chained-op slopes. The axon remote-compile tunnel keeps
the dispatch path busy for a while after each fresh compile, so timeit
settles (sleep) after warmup before timing."""
import sys, time
import jax
import jax.numpy as jnp
import numpy as np

def timeit(fn, *args, iters=30):
    out = fn(*args); jax.block_until_ready(out)
    time.sleep(2.0)
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best

def p(*a):
    print(*a); sys.stdout.flush()

rng = np.random.default_rng(0)
SH = (256, 3, 4096)
nel = np.prod(SH)
x = jnp.asarray(rng.integers(0, 1 << 30, size=SH, dtype=np.uint32))

Q = (1 << 30) - (1 << 18) + 1
W = 123456789 % Q
WS = (W << 32) // Q

def mulhi(a, b):
    al, ah = a & 0xFFFF, a >> 16
    bl, bh = b & 0xFFFF, b >> 16
    mid = al * bh + ah * bl
    lo = al * bl
    carry = (lo >> 16) + (mid & 0xFFFF)
    return ah * bh + (mid >> 16) + (carry >> 16)

def shoup_chain(k):
    q = jnp.uint32(Q); w = jnp.uint32(W); ws = jnp.uint32(WS)
    def f(a):
        for _ in range(k):
            hi = mulhi(a, ws)
            r = a * w - hi * q
            a = jnp.where(r >= q, r - q, r)
        return a
    return jax.jit(f)

def add_chain(k):
    def f(a):
        b = a
        for i in range(k):
            b = b + a
        return b
    return jax.jit(f)

def mullo_chain(k):
    def f(a):
        b = a
        for i in range(k):
            b = b * a
        return b
    return jax.jit(f)

def mulhi_chain(k):
    def f(a):
        b = a
        for i in range(k):
            b = mulhi(b, a)
        return b
    return jax.jit(f)

jobs = [
    ("add k=1", add_chain(1), 1),
    ("add k=32", add_chain(32), 32),
    ("mullo k=16", mullo_chain(16), 16),
    ("mulhi k=8", mulhi_chain(8), 8),
    ("shoup k=1", shoup_chain(1), 1),
    ("shoup k=8", shoup_chain(8), 8),
]
# compile everything first, then measure
for name, f, k in jobs:
    jax.block_until_ready(f(x))
time.sleep(3)
for name, f, k in jobs:
    dt = timeit(f, x)
    p(f"{name}: {dt*1e6:.1f} us -> {nel*k/dt/1e9:.1f} Gop/s")
