"""Careful VPU op-cost measurements: chain K dependent ops over a fixed array
so HBM traffic amortizes; slope of time vs K = per-op cost."""
import time
import jax
import jax.numpy as jnp
import numpy as np

def timeit(fn, *args, iters=30):
    out = fn(*args); jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best

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

for k in (1, 4, 16):
    dt = timeit(shoup_chain(k), x)
    print(f"shoup chain k={k}: {dt*1e6:.1f} us  -> {nel*k/dt/1e9:.1f} Gmulmod/s")

def add_chain(k):
    def f(a):
        b = a
        for i in range(k):
            b = b + a
        return b
    return jax.jit(f)
for k in (1, 16, 64):
    dt = timeit(add_chain(k), x)
    print(f"add chain k={k}: {dt*1e6:.1f} us -> {nel*k/dt/1e9:.1f} Gadd/s")

def mullo_chain(k):
    def f(a):
        b = a
        for i in range(k):
            b = b * a
        return b
    return jax.jit(f)
for k in (16,):
    dt = timeit(mullo_chain(k), x)
    print(f"mullo chain k={k}: {dt*1e6:.1f} us -> {nel*k/dt/1e9:.1f} Gmul/s")

def mulhi_chain(k):
    def f(a):
        b = a
        for i in range(k):
            b = mulhi(b, a)
        return b
    return jax.jit(f)
for k in (8,):
    dt = timeit(mulhi_chain(k), x)
    print(f"mulhi chain k={k}: {dt*1e6:.1f} us -> {nel*k/dt/1e9:.1f} Gmulhi/s")

# digit extract with GOOD layout: output (4, ...) leading axis
def extract(a):
    return jnp.stack([(a >> (8 * i)).astype(jnp.uint8) for i in range(4)], axis=0)
dt = timeit(jax.jit(extract), x)
print(f"extract 4 planes (leading axis): {dt*1e6:.1f} us -> {nel/dt/1e9:.1f} Gel/s")

# i8 bitcast + xor trick
def extract_signed(a):
    return jnp.stack([((a >> (8 * i)).astype(jnp.uint8) ^ jnp.uint8(0x80)).astype(jnp.int8) for i in range(4)], axis=0)
dt = timeit(jax.jit(extract_signed), x)
print(f"extract 4 signed planes: {dt*1e6:.1f} us -> {nel/dt/1e9:.1f} Gel/s")

# fold: 7 groups on LEADING axis, shoup consts
g = jnp.asarray(rng.integers(0, 1 << 24, size=(7,) + SH, dtype=np.uint32))
cs = [int(v) for v in rng.integers(1, Q, size=7)]
css = [(c << 32) // Q for c in cs]
def fold7(gg):
    q = jnp.uint32(Q)
    acc = None
    for s in range(7):
        w = jnp.uint32(cs[s]); ws = jnp.uint32(css[s])
        hi = mulhi(gg[s], ws)
        r = gg[s] * w - hi * q
        acc = r if acc is None else acc + r
        if s % 2 == 1:
            acc = jnp.where(acc >= 2 * q, acc - 2 * q, acc)
    return jnp.where(acc >= q, acc - q, jnp.where(acc >= 2*q, acc - 2*q, acc))
dt = timeit(jax.jit(fold7), g)
print(f"fold7 (leading groups): {dt*1e6:.1f} us -> {nel/dt/1e9:.2f} Gel(out)/s")
