"""Multiply-graph engine A/B: four (jnp) vs vmem (Pallas NTT) vs fused."""
import sys, time
import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from pplp_tpu.bfv import BFVContext, EncryptionParameters
from pplp_tpu.bfv.behz import RnsMultiplier, create_relin_keys, relinearize
from pplp_tpu.bfv.behz_fused import FusedMultiplier
from pplp_tpu.bfv.ciphertext import Ciphertext
from pplp_tpu.bfv.keys import KeyGenerator

N, BATCH = 4096, 256
parms = EncryptionParameters.bfv(N, 1 << 16, profile="tpu")

def cts(ctx):
    rng = np.random.default_rng(0)
    qs = np.array([m.value for m in ctx.moduli], np.uint64)[None, :, None]
    def poly():
        v = rng.integers(0, 1 << 62, size=(BATCH, ctx.L, N)).astype(np.uint64) % qs
        return jnp.asarray(v.astype(np.uint32))
    return Ciphertext((poly(), poly()), "coeff"), Ciphertext((poly(), poly()), "coeff")

def windows(fn, a, b, label, wins=12):
    out = fn(a, b); jax.block_until_ready(out)
    ts = []
    for _ in range(wins):
        t0 = time.perf_counter()
        for _ in range(3):
            out = fn(a, b)
        jax.block_until_ready(out)
        ts.append((time.perf_counter()-t0)/3)
        time.sleep(0.4)
    ts.sort()
    print(f"{label}: best {BATCH/ts[0]:,.0f}/s  median {BATCH/ts[len(ts)//2]:,.0f}/s", flush=True)

for engine in ("four", "vmem"):
    ctx = BFVContext.build(parms, engine=engine)
    kg = KeyGenerator(ctx, 0)
    rlk = create_relin_keys(ctx, kg.secret_key(), jax.random.key(1))
    mul = RnsMultiplier(ctx)
    ct1, ct2 = cts(ctx)
    mr = jax.jit(lambda a, b: relinearize(ctx, mul.multiply(a, b), rlk).polys)
    windows(mr, ct1, ct2, f"xla graph engine={engine}")
    if engine == "vmem":
        fused = FusedMultiplier(ctx, rlk, tile_b=2)
        fr = lambda a, b: fused.multiply_relinearize(a, b).polys
        windows(fr, ct1, ct2, "fused kernel (tile 2)")
