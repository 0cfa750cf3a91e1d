"""Bisect the fused multiply kernel: NTT stages vs everything else.
Monkeypatches the in-kernel NTTs to identity (wrong math, same shapes)."""
import sys, time
import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
import pplp_tpu.bfv.behz_fused as bf
from pplp_tpu.bfv import BFVContext, EncryptionParameters
from pplp_tpu.bfv.behz import create_relin_keys
from pplp_tpu.bfv.ciphertext import Ciphertext
from pplp_tpu.bfv.keys import KeyGenerator
from pplp_tpu.ops.modmath import m31

MODE = sys.argv[1] if len(sys.argv) > 1 else "full"   # full | nontt | nttonly

if MODE == "nontt":
    bf._ntt_fwd = lambda x, tabs, q, c1, logc1: x
    bf._ntt_inv = lambda x, tabs, q, c1, logc1: x
elif MODE == "nttonly":
    # keep NTTs; stub the conversions/floor/sk phases
    bf._to_bsk = lambda x_q, kc, mt: jnp.concatenate(
        [x_q, x_q[:, : kc.qb.shape[0] - x_q.shape[1]]], axis=1)
    bf._fast_floor = lambda e_q, e_b, kc: e_b
    bf._sk_to_q = lambda w, kc, l, h: w[:, : kc.qq.shape[0]]

N, BATCH, TILE = 4096, 256, int(sys.argv[2]) if len(sys.argv) > 2 else 2
parms = EncryptionParameters.bfv(N, 1 << 16, profile="tpu")
ctx = BFVContext.build(parms, engine="vmem")
kg = KeyGenerator(ctx, 0)
rlk = create_relin_keys(ctx, kg.secret_key(), jax.random.key(1))
fused = bf.FusedMultiplier(ctx, rlk, tile_b=TILE)

rng = np.random.default_rng(0)
qs = np.array([m.value for m in ctx.moduli], np.uint64)[None, :, None]
def ct():
    def poly():
        v = rng.integers(0, 1 << 62, size=(BATCH, ctx.L, N)).astype(np.uint64) % qs
        return jnp.asarray(v.astype(np.uint32))
    return Ciphertext((poly(), poly()), "coeff")
ct1, ct2 = ct(), ct()
out = fused.multiply_relinearize(ct1, ct2)
jax.block_until_ready(out.polys)
ts = []
for _ in range(10):
    t0 = time.perf_counter()
    for _ in range(4):
        out = fused.multiply_relinearize(ct1, ct2)
    jax.block_until_ready(out.polys)
    ts.append((time.perf_counter() - t0) / 4)
    time.sleep(0.2)
print(f"{MODE}: best {min(ts)*1e3:.2f} ms/batch  median {sorted(ts)[5]*1e3:.2f}")
