"""Minimal TPU repro for the v2 split butterfly inside a rank-4 kernel."""
import sys
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from pplp_tpu.utils.chipstate import enable_compile_cache
from pplp_tpu.ops.ntt_vmem import _bf_ct_split, _bf_gs_z, _bf_ct_z, _expand_q

enable_compile_cache()

T, K, c1, C2 = 4, 4, 32, 128
Q = (1 << 27) - 39


def make(case):
    def kernel(x_ref, w_ref, ws_ref, m_ref, o_ref):
        x = x_ref[...]
        q = jnp.full((K, 1, 1), Q, jnp.uint32) if False else w_ref[...] * 0 + Q
        # q as [K,1,1] value from a ref:
        qk = q[:, :1, :1] * 0 + jnp.uint32(Q)
        if case == "split":
            x = _bf_ct_split(x, w_ref[...], ws_ref[...], 8, _expand_q(qk), c1)
        elif case == "gsz":
            x = _bf_gs_z(x, w_ref[..., :1, :], ws_ref[..., :1, :],
                         m_ref[...], 32, jnp.uint32(Q), C2, 3)
        elif case == "ctz":
            x = _bf_ct_z(x, w_ref[..., :1, :], ws_ref[..., :1, :],
                         m_ref[...], 4, jnp.uint32(Q), C2, 3)
        o_ref[...] = x

    vm = pltpu.VMEM
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, Q, (T, K, c1, C2)), jnp.uint32)
    w = jnp.asarray(rng.integers(1, Q, (K, c1, 1)), jnp.uint32)
    ws = jnp.asarray(rng.integers(1, Q, (K, c1, 1)), jnp.uint32)
    m = jnp.asarray(rng.integers(0, 2, (1, C2)), jnp.uint32)
    f = jax.jit(lambda *a: pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=vm)] * 4,
        out_specs=pl.BlockSpec(memory_space=vm),
        out_shape=jax.ShapeDtypeStruct((T, K, c1, C2), jnp.uint32),
    )(*a))
    try:
        out = f(x, w, ws, m)
        jax.block_until_ready(out)
        print(f"{case}: OK", flush=True)
    except Exception as e:
        print(f"{case}: FAIL {type(e).__name__}: {str(e)[:300]}", flush=True)


for case in ("gsz", "ctz", "split"):
    make(case)
