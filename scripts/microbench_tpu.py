"""Microbenchmarks on the real chip: int8 MXU matmul, u32 VPU primitives,
and digit-NTT building blocks. Grounds the round-2 multiply redesign."""
import time
import jax
import jax.numpy as jnp
import numpy as np

def timeit(fn, *args, iters=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best

print("devices:", jax.devices())
rng = np.random.default_rng(0)

# --- 1. int8 matmul -> int32 (MXU path) ------------------------------------
for (M, K, N) in [(16384, 256, 64), (16384, 256, 128), (65536, 256, 128), (16384, 512, 128)]:
    a = jnp.asarray(rng.integers(-128, 127, size=(M, K), dtype=np.int8))
    b = jnp.asarray(rng.integers(-128, 127, size=(K, N), dtype=np.int8))
    f = jax.jit(lambda a, b: jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32))
    dt = timeit(f, a, b)
    print(f"int8 dot {M}x{K}x{N}: {dt*1e6:.1f} us  {2*M*K*N/dt/1e12:.2f} TOPS")

# --- 1b. grouped (batched) int8 matmul: 64 groups of [Mg,64]@[64,64] --------
G, Mg = 64, 4096
a = jnp.asarray(rng.integers(-128, 127, size=(G, Mg, 64), dtype=np.int8))
b = jnp.asarray(rng.integers(-128, 127, size=(G, 64, 64), dtype=np.int8))
f = jax.jit(lambda a, b: jax.lax.dot_general(a, b, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.int32))
dt = timeit(f, a, b)
print(f"int8 grouped dot {G}x[{Mg}x64x64]: {dt*1e6:.1f} us  {2*G*Mg*64*64/dt/1e12:.2f} TOPS")

# --- 2. u32 VPU primitives ---------------------------------------------------
SH = (256, 3, 4096)  # the mult working shape
x = jnp.asarray(rng.integers(0, 1 << 30, size=SH, dtype=np.uint32))
y = jnp.asarray(rng.integers(0, 1 << 30, size=SH, dtype=np.uint32))
nel = np.prod(SH)

f_add = jax.jit(lambda a, b: a + b)
print(f"u32 add: {timeit(f_add, x, y)*1e6:.0f} us for {nel/1e6:.1f}M el -> {nel/timeit(f_add,x,y)/1e9:.1f} Gel/s")

f_mullo = jax.jit(lambda a, b: a * b)
print(f"u32 mullo: {nel/timeit(f_mullo,x,y)/1e9:.1f} Gel/s")

def mulhi(a, b):
    al, ah = a & 0xFFFF, a >> 16
    bl, bh = b & 0xFFFF, b >> 16
    mid = al * bh + ah * bl
    lo = al * bl
    carry = (lo >> 16) + (mid & 0xFFFF)
    return ah * bh + (mid >> 16) + (carry >> 16)
f_mulhi = jax.jit(mulhi)
print(f"u32 mulhi(16-bit split): {nel/timeit(f_mulhi,x,y)/1e9:.1f} Gel/s")

def mulhi64(a, b):
    a64 = a.astype(jnp.uint64); b64 = b.astype(jnp.uint64)
    return ((a64 * b64) >> np.uint64(32)).astype(jnp.uint32)
try:
    f_mulhi64 = jax.jit(mulhi64)
    print(f"u32 mulhi(u64 cast): {nel/timeit(f_mulhi64,x,y)/1e9:.1f} Gel/s")
except Exception as e:
    print("u64 path unavailable:", e)

q = jnp.uint32((1 << 30) - (1 << 18) + 1)
w = jnp.uint32(123456789 % ((1 << 30) - (1 << 18) + 1))
ws = jnp.uint32(((int(w) << 32) // int(q)))
def shoup(a):
    hi = mulhi(a, ws)
    r = a * w - hi * q
    return jnp.where(r >= q, r - q, r)
f_shoup = jax.jit(shoup)
print(f"shoup mulmod const: {nel/timeit(f_shoup,x)/1e9:.1f} Gel/s")

# digit extract: u32 -> 4 x i8 (xor-bias trick)
def extract(a):
    d0 = (a & 0xFF).astype(jnp.uint8)
    d1 = ((a >> 8) & 0xFF).astype(jnp.uint8)
    d2 = ((a >> 16) & 0xFF).astype(jnp.uint8)
    d3 = ((a >> 24) & 0xFF).astype(jnp.uint8)
    return jnp.stack([d0, d1, d2, d3], axis=-1)
f_ex = jax.jit(extract)
print(f"digit extract 4xu8: {nel/timeit(f_ex,x)/1e9:.1f} Gel/s")

# 64-bit fold: 7 groups int32 -> mod q via shoup consts
g = jnp.asarray(rng.integers(0, 1 << 24, size=SH + (7,), dtype=np.uint32))
cs = jnp.asarray(rng.integers(0, 1 << 30, size=(7,), dtype=np.uint32))
css = jnp.asarray([(int(c) << 32) // int(q) for c in np.asarray(cs)], dtype=np.uint32)
def fold7(gg):
    acc = None
    for s in range(7):
        hi = mulhi(gg[..., s], css[s])
        r = gg[..., s] * cs[s] - hi * q
        acc = r if acc is None else acc + r  # lazy, [0, 14q) < 2^32? 14*2^30 > 2^32! use partial csub
        if s % 2 == 1:
            acc = jnp.where(acc >= 2 * q, acc - 2 * q, acc)
    return jnp.where(acc >= q, acc - q, acc)
f_f7 = jax.jit(fold7)
print(f"fold7 shoup: {nel/timeit(f_f7,g)/1e9:.1f} Gel/s")
