"""Fused Pallas TPU kernel for the four-step negacyclic NTT.

One kernel program = one (RNS limb, batch tile): the [TILE_B, n] block plus
that limb's twiddle tables live in VMEM and ALL stages run without touching
HBM (the XLA stage-sweep path round-trips HBM per stage).

Butterflies use a roll-and-select formulation chosen for Mosaic's vector
layout rules: the partner element of row r at stride t is fetched with a
circular roll of +-t along the sublane axis and selected by a precomputed
parity mask — no sublane-regrouping reshapes, no sub-128 lane reshapes.
Twiddles are host-expanded to full per-stage columns ([stage, rows, 1]), so
every in-kernel operand is a plain 2-D tile.

Spectrum order is IDENTICAL to ``ntt4.forward4`` (same math, same placement),
so the two engines interoperate within a context.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .modmath import m31
from .ntt4 import C2, _LOG_C2, FourStepTables

__all__ = ["PallasNttTables", "build_pallas_tables", "forward4_pallas", "inverse4_pallas"]


@dataclass
class PallasNttTables:
    base: FourStepTables
    # Expanded per-stage tables, all shaped [L, S, rows, 1] u32:
    aw: Any    # step A fwd twiddles, rows = c1
    aws: Any
    iaw: Any   # step A inv
    iaws: Any
    cw: Any    # step C fwd, rows = C2
    cws: Any
    icw: Any
    icws: Any
    # Parity masks (1 = "hi" row of the pair), [S, rows, 1] u32 (shared by L):
    amask: Any
    cmask: Any


def _expand_a(tbl_row, c1, logc1, direction):
    """Per-stage full-column twiddles for the C1-axis transform.

    fwd (CT): stage s has h=2^s groups, t=c1/2^{s+1}; twiddle for row r is
    tbl[h + r//(2t)]. inv (GS): stage s has t=2^s, h=c1/2^{s+1} groups in the
    table sense — twiddle index h + r//(2t) with that stage's (h, t).
    """
    out = np.zeros((logc1, c1), np.uint32)
    for s in range(logc1):
        if direction == "fwd":
            h, t = 1 << s, c1 >> (s + 1)
        else:
            t = 1 << s
            h = c1 >> (s + 1)
        for r in range(c1):
            out[s, r] = tbl_row[h + r // (2 * t)]
    return out


def _expand_c(tbl_sxt, direction):
    """Per-stage full-column twiddles for the C2-axis cyclic transform.

    fwd: kernel stage s runs at t = 64 >> s using build row s (same t).
    inv: kernel stage s runs at t = 2^s, which is build row (6 - s).
    Twiddle for row r is that stage table's entry [r % t].
    """
    out = np.zeros((_LOG_C2, C2), np.uint32)
    for s in range(_LOG_C2):
        if direction == "fwd":
            t, src = C2 >> (s + 1), s
        else:
            t, src = 1 << s, _LOG_C2 - 1 - s
        for r in range(C2):
            out[s, r] = tbl_sxt[src][r % t]
    return out


def _masks(rows, nstages, t_of_stage):
    out = np.zeros((nstages, rows), np.uint32)
    for s in range(nstages):
        t = t_of_stage(s)
        for r in range(rows):
            out[s, r] = (r // t) & 1
    return out


def build_pallas_tables(tb: FourStepTables) -> PallasNttTables:
    # May be reached during jit tracing (first call inside a jitted fn):
    # force host-side evaluation of the table expansions.
    with jax.ensure_compile_time_eval():
        return _build_pallas_tables_eager(tb)


def _build_pallas_tables_eager(tb: FourStepTables) -> PallasNttTables:
    c1, logc1 = tb.c1, tb.logc1
    L = tb.L

    def per_limb(arr_2d, expander, direction):
        rows = [expander(np.asarray(arr_2d[li]), direction) for li in range(L)]
        return jnp.asarray(np.stack(rows)[..., None])  # [L, S, rows, 1]

    exp_a = lambda row, d: _expand_a(row, c1, logc1, d)
    exp_c = lambda sxt, d: _expand_c(sxt, d)

    amask = _masks(c1, logc1, lambda s: c1 >> (s + 1))
    # inv A stage s uses t = 2^s: same mask family, different order; build both
    # orders into one [2*logc1? ] — simpler: mask by stride index log2(t):
    # store fwd-order and inv-order separately.
    amask_inv = _masks(c1, logc1, lambda s: 1 << s)
    cmask = _masks(C2, _LOG_C2, lambda s: C2 >> (s + 1))
    cmask_inv = _masks(C2, _LOG_C2, lambda s: 1 << s)

    return PallasNttTables(
        base=tb,
        aw=per_limb(tb.w1, exp_a, "fwd"),
        aws=per_limb(tb.w1s, exp_a, "fwd"),
        iaw=per_limb(tb.iw1, exp_a, "inv"),
        iaws=per_limb(tb.iw1s, exp_a, "inv"),
        cw=per_limb(tb.wc, exp_c, "fwd"),
        cws=per_limb(tb.wcs, exp_c, "fwd"),
        icw=per_limb(tb.iwc, exp_c, "inv"),
        icws=per_limb(tb.iwcs, exp_c, "inv"),
        amask=(jnp.asarray(amask[..., None]), jnp.asarray(amask_inv[..., None])),
        cmask=(jnp.asarray(cmask[..., None]), jnp.asarray(cmask_inv[..., None])),
    )


def _roll(x, shift, axis):
    return pltpu.roll(x, shift, axis)


def _butterfly_ct(x, w, ws, hi, t, q, rows):
    """CT-style Harvey-lazy: in/out < 4q; pairs (r, r+t) via rolls."""
    down = _roll(x, rows - t, 1)  # x[r+t] at row r
    up = _roll(x, t, 1)           # x[r-t] at row r
    hi_b = hi != 0
    u = m31.csub2q(jnp.where(hi_b, up, x), q * 2)
    v = jnp.where(hi_b, x, down)
    mv = m31.mulmod_shoup_lazy(v, w, ws, q)
    return jnp.where(hi_b, u - mv + q * 2, u + mv)


def _butterfly_gs(x, w, ws, hi, t, q, rows):
    """GS-style Harvey-lazy: in/out < 2q."""
    down = _roll(x, rows - t, 1)
    up = _roll(x, t, 1)
    hi_b = hi != 0
    u = jnp.where(hi_b, up, x)
    v = jnp.where(hi_b, x, down)
    s = m31.csub2q(u + v, q * 2)
    d = m31.mulmod_shoup_lazy(u - v + q * 2, w, ws, q)
    return jnp.where(hi_b, d, s)


def _kernel(direction, c1, logc1, q_ref,
            aw, aws, cw, cws, am, cm, twm, twms, x_ref, o_ref):
    # Spectrum-side blocks are kept 4-D [1, TILE_B, C2, c1]: flattening a
    # sub-128-lane trailing dim is an unsupported Mosaic shape cast; the
    # wrapper reshapes on the HBM side (free, row-major).
    q = q_ref[pl.program_id(0)]
    if direction == "fwd":
        x = x_ref[0]  # [TILE_B, n]
        tile_b = x.shape[0]
        x = x.reshape(tile_b, c1, C2)
        for s in range(logc1):
            t = c1 >> (s + 1)
            x = _butterfly_ct(x, aw[0, s], aws[0, s], am[s], t, q, c1)
        x = m31.mulmod_shoup_lazy(x, twm[0], twms[0], q)
        x = jnp.swapaxes(x, -1, -2)  # [TILE_B, C2, c1]
        for s in range(_LOG_C2):
            t = C2 >> (s + 1)
            x = _butterfly_gs(x, cw[0, s], cws[0, s], cm[s], t, q, C2)
        o_ref[0] = m31.csub(x, q)
    else:
        x = x_ref[0]  # [TILE_B, C2, c1]
        tile_b = x.shape[0]
        for s in range(_LOG_C2):
            t = 1 << s
            x = _butterfly_ct(x, cw[0, s], cws[0, s], cm[s], t, q, C2)
        x = jnp.swapaxes(x, -1, -2)  # [TILE_B, c1, C2]
        x = m31.mulmod_shoup_lazy(x, twm[0], twms[0], q)
        for s in range(logc1):
            t = 1 << s
            x = _butterfly_gs(x, aw[0, s], aws[0, s], am[s], t, q, c1)
        o_ref[0] = m31.csub(x.reshape(tile_b, c1 * C2), q)


def _interpret_default() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _ptables(tb: FourStepTables) -> PallasNttTables:
    # Cached on the tables object itself (id()-keyed dicts risk reuse).
    cached = getattr(tb, "_pallas_tables", None)
    if cached is None:
        cached = build_pallas_tables(tb)
        tb._pallas_tables = cached
    return cached


def _run(direction, x, tb: FourStepTables, tile_b: int, interpret=None):
    pt = _ptables(tb)
    *batch, L, n = x.shape
    assert L == tb.L and n == tb.n
    xb = x.reshape((-1, L, n))
    B = xb.shape[0]
    cands = [t for t in range(min(tile_b, B), 0, -1)
             if B % t == 0 and (t % 8 == 0 or t == B)]
    tile_b = cands[0] if cands else B
    c1 = tb.c1
    xl = jnp.swapaxes(xb, 0, 1)  # [L, B, n]

    if direction == "fwd":
        aw, aws, cw, cws = pt.aw, pt.aws, pt.cw, pt.cws
        am, cm = pt.amask[0], pt.cmask[0]
        twm, twms = tb.tw, tb.tws
    else:
        aw, aws, cw, cws = pt.iaw, pt.iaws, pt.icw, pt.icws
        am, cm = pt.amask[1], pt.cmask[1]
        twm, twms = tb.itw, tb.itws

    vm = pltpu.VMEM
    grid = (L, B // tile_b)
    spec_a = pl.BlockSpec((1,) + aw.shape[1:], lambda l, b, *_: (l, 0, 0, 0), memory_space=vm)
    spec_c = pl.BlockSpec((1,) + cw.shape[1:], lambda l, b, *_: (l, 0, 0, 0), memory_space=vm)
    spec_am = pl.BlockSpec(am.shape, lambda l, b, *_: (0, 0, 0), memory_space=vm)
    spec_cm = pl.BlockSpec(cm.shape, lambda l, b, *_: (0, 0, 0), memory_space=vm)
    spec_tw = pl.BlockSpec((1, c1, C2), lambda l, b, *_: (l, 0, 0), memory_space=vm)
    spec_coeff = pl.BlockSpec((1, tile_b, n), lambda l, b, *_: (l, b, 0), memory_space=vm)
    spec_spec = pl.BlockSpec(
        (1, tile_b, C2, c1), lambda l, b, *_: (l, b, 0, 0), memory_space=vm
    )

    if direction == "fwd":
        in_x, out_x = spec_coeff, spec_spec
        x_arg = xl
        out_shape = jax.ShapeDtypeStruct((L, B, C2, c1), jnp.uint32)
    else:
        in_x, out_x = spec_spec, spec_coeff
        x_arg = xl.reshape(L, B, C2, c1)
        out_shape = jax.ShapeDtypeStruct((L, B, n), jnp.uint32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[spec_a, spec_a, spec_c, spec_c, spec_am, spec_cm,
                  spec_tw, spec_tw, in_x],
        out_specs=out_x,
    )
    out = pl.pallas_call(
        functools.partial(_kernel, direction, c1, tb.logc1),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=_interpret_default() if interpret is None else interpret,
    )(tb.q, aw, aws, cw, cws, am, cm, twm, twms, x_arg)
    out = out.reshape(L, B, n)
    return jnp.swapaxes(out, 0, 1).reshape(x.shape)


def forward4_pallas(x, tb: FourStepTables, tile_b: int = 8, interpret=None):
    """x: [..., L, n] -> spectra, same order as ntt4.forward4."""
    return _run("fwd", x, tb, tile_b, interpret)


def inverse4_pallas(x, tb: FourStepTables, tile_b: int = 8, interpret=None):
    return _run("inv", x, tb, tile_b, interpret)
