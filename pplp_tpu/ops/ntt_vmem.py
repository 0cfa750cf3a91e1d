"""Fused VMEM-resident negacyclic NTT kernel, transpose-free.

One Pallas program = one (RNS limb, batch tile). The [TILE_B, n] block is
reshaped in VMEM to [TILE_B, c1, C2=128] and ALL stages run without touching
HBM:

  step A  — length-c1 negacyclic CT butterflies along the *sublane* axis
            (root psi^C2, bit-reversed Harvey tables, same math as ntt4);
  step B  — pointwise twiddle T[p1, j2] = psi^{j2(2 brv(p1)+1)};
  step C  — length-128 cyclic GS butterflies along the *lane* axis
            (root psi^{2 c1}) — full lane utilization, no transpose.

Butterflies use the roll-and-select formulation (the partner element
arrives by a circular roll; a precomputed parity mask picks u/v), which is the
lane/sublane-friendly shape for Mosaic. All stages are Harvey-lazy ([0,4q) /
[0,2q) residues); inputs and outputs are canonical.

Spectrum order (internal, self-consistent): flat index p = p1*C2 + p2 holds
X[brv_c1(p1) + c1*brv_C2(p2)]. ``inverse_vmem`` consumes exactly this order,
and pointwise products only ever pair like-ordered spectra.

Replaces (TPU-native) the role of SEAL's ntt_negacyclic_harvey
(/root/reference: every Evaluator op in src/demo.cc:154-160 bottoms out
there); designed for the VPU rather than scalar butterflies.
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

def _interpret_default() -> bool:
    import jax

    return jax.default_backend() not in ("tpu", "axon")


__all__ = ["VmemNttTables", "build_vmem_tables", "forward_vmem", "inverse_vmem"]


@dataclass
class VmemNttTables:
    base: FourStepTables
    # Step A per-stage full-column twiddles [L, S, c1, 1] (+ Shoup):
    aw: Any
    aws: Any
    iaw: Any
    iaws: Any
    # Step C per-stage full-lane twiddles [L, S, 1, C2] (+ Shoup):
    cw: Any
    cws: Any
    icw: Any
    icws: Any
    # Parity masks (1 = "hi" element of the pair), shared across limbs:
    amask: Any   # (fwd [S, c1, 1], inv [S, c1, 1])
    cmask: Any   # (fwd [S, 1, C2], inv [S, 1, C2])
    # v2 z-form tables for the inverse lane CT stages [L, S, 1, C2]:
    # wz = 1 at "lo" (u) lanes, stage twiddle at "hi" (v) lanes.
    icwz: Any = None
    icwzs: Any = None


def _expand_rows(tbl_row, rows, nstages, direction):
    """Step-A column twiddles: fwd CT stage s has h=2^s, t=rows>>(s+1);
    inv GS stage s has t=2^s, h=rows>>(s+1). Twiddle of row r: tbl[h+r//(2t)]
    (identical for both rows of a pair)."""
    out = np.zeros((nstages, rows), np.uint32)
    for s in range(nstages):
        if direction == "fwd":
            h, t = 1 << s, rows >> (s + 1)
        else:
            t, h = 1 << s, rows >> (s + 1)
        for r in range(rows):
            out[s, r] = tbl_row[h + r // (2 * t)]
    return out


def _expand_lanes(tbl_sxt, direction):
    """Step-C lane twiddles: fwd GS kernel stage s runs t=C2>>(s+1) using
    build row s; inv CT kernel stage s runs t=2^s using build row
    LOG_C2-1-s. Twiddle of lane r: row[r % t] (same for both pair lanes)."""
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


def build_vmem_tables(tb: FourStepTables) -> VmemNttTables:
    with jax.ensure_compile_time_eval():
        return _build_eager(tb)


def _build_eager(tb: FourStepTables) -> VmemNttTables:
    c1, logc1, L = tb.c1, tb.logc1, tb.L

    def rows_tbl(arr_2d, direction):  # [L, S, c1, 1]
        rows = [_expand_rows(np.asarray(arr_2d[li]), c1, logc1, direction)
                for li in range(L)]
        return jnp.asarray(np.stack(rows)[..., None])

    def lanes_tbl(arr_3d, direction):  # [L, S, 1, C2]
        rows = [_expand_lanes(np.asarray(arr_3d[li]), direction)
                for li in range(L)]
        return jnp.asarray(np.stack(rows)[:, :, None, :])

    amask_f = _masks(c1, logc1, lambda s: c1 >> (s + 1))
    amask_i = _masks(c1, logc1, lambda s: 1 << s)
    cmask_f = _masks(C2, _LOG_C2, lambda s: C2 >> (s + 1))
    cmask_i = _masks(C2, _LOG_C2, lambda s: 1 << s)

    icw = lanes_tbl(tb.iwc, "inv")
    icws = lanes_tbl(tb.iwcs, "inv")
    # z-form inverse lane tables: twiddle at hi lanes, multiplicative identity
    # at lo lanes (wz=1, Shoup(1) = floor(2^32/q) per limb).
    cm_i = cmask_i[:, None, :].astype(bool)  # [S, 1, C2]
    s1 = np.asarray(
        [(1 << 32) // int(q) for q in np.asarray(tb.q)], np.uint32
    ).reshape(L, 1, 1, 1)
    icwz = jnp.asarray(np.where(cm_i[None], np.asarray(icw), 1))
    icwzs = jnp.asarray(np.where(cm_i[None], np.asarray(icws), s1))

    return VmemNttTables(
        base=tb,
        aw=rows_tbl(tb.w1, "fwd"), aws=rows_tbl(tb.w1s, "fwd"),
        iaw=rows_tbl(tb.iw1, "inv"), iaws=rows_tbl(tb.iw1s, "inv"),
        cw=lanes_tbl(tb.wc, "fwd"), cws=lanes_tbl(tb.wcs, "fwd"),
        icw=icw, icws=icws,
        amask=(jnp.asarray(amask_f[..., None]), jnp.asarray(amask_i[..., None])),
        cmask=(jnp.asarray(cmask_f[:, None, :]), jnp.asarray(cmask_i[:, None, :])),
        icwz=icwz, icwzs=icwzs,
    )


def _bf_ct(x, w, ws, hi, t, q, rows, axis):
    """CT-style Harvey-lazy butterfly via roll+select: in/out < 4q."""
    down = pltpu.roll(x, rows - t, axis)   # x[r+t] at position r
    up = pltpu.roll(x, t, axis)            # x[r-t] at position r
    hi_b = hi != 0
    u = m31.csub2q(jnp.where(hi_b, up, x), q * 2)
    v = jnp.where(hi_b, x, down)
    mv = m31.mulmod_shoup_lazy(v, w, ws, q)
    return jnp.where(hi_b, u - mv + q * 2, u + mv)


def _bf_gs(x, w, ws, hi, t, q, rows, axis):
    """GS-style Harvey-lazy butterfly via roll+select: in/out < 2q."""
    down = pltpu.roll(x, rows - t, axis)
    up = pltpu.roll(x, t, axis)
    hi_b = hi != 0
    u = jnp.where(hi_b, up, x)
    v = jnp.where(hi_b, x, down)
    s = m31.csub2q(u + v, q * 2)
    d = m31.mulmod_shoup_lazy(u - v + q * 2, w, ws, q)
    return jnp.where(hi_b, d, s)


# ---------------------------------------------------------------------------
# v2 stage formulations. Same math, same element placement, fewer vector ops:
#
# * Sublane (second-minor) stages pair CONTIGUOUS halves of 2t-row blocks, so
#   a rank-raising reshape exposes (u, v) as separate half-width arrays and
#   the Shoup multiply runs on half the elements (sublane-width ops shrink
#   with the array; lane-width ops would not).
# * Lane stages stay full-width (128-lane SIMD can't skip lanes) but drop the
#   pre-selects: the inverse CT form multiplies x by a z-table (twiddle at hi
#   lanes, 1 at lo lanes) FIRST, then combines rolled copies; the forward GS
#   form computes sum/diff paths directly from rolled x.
#
# Intermediate residue representatives can differ from v1 (identical bounds,
# same value mod q); canonical outputs are bit-identical.
# ---------------------------------------------------------------------------


def _expand_q(q):
    """[K,1,1] per-limb modulus -> broadcastable against split rank+1 views."""
    if hasattr(q, "ndim") and q.ndim >= 3:
        return q[..., None, :, :]
    return q


def _blocks(w_rows, nb):
    """Full-row twiddle table [..., rows, 1] -> per-block half [..., nb, t, 1].

    Stage twiddles are constant within each 2t-row pair block, so the first
    half of each block carries the right value at every row; keeping the
    t-axis materialized means the later multiply only broadcasts along
    lanes (Mosaic cannot broadcast sublanes and lanes in one op)."""
    lead = w_rows.shape[:-2]
    t = w_rows.shape[-2] // (2 * nb)
    return w_rows.reshape(lead + (nb, 2, t, 1))[..., :, 0, :, :]


def _bf_ct_split(x, w_rows, ws_rows, t, qx, rows):
    """CT butterfly on the second-minor axis via contiguous-half split.

    x: [..., rows, C2] with in/out < 4q; qx = _expand_q(modulus) so it
    broadcasts against the split rank+1 view."""
    nb = rows // (2 * t)
    shp = x.shape
    x6 = x.reshape(shp[:-2] + (nb, 2, t, shp[-1]))
    u = x6[..., 0, :, :]
    v = x6[..., 1, :, :]
    wb = _blocks(w_rows, nb)
    wbs = _blocks(ws_rows, nb)
    mv = m31.mulmod_shoup_lazy(v, wb, wbs, qx)
    u2 = m31.csub2q(u, qx * 2)
    out = jnp.stack([u2 + mv, u2 + qx * 2 - mv], axis=-3)
    return out.reshape(shp)


def _bf_gs_split(x, w_rows, ws_rows, t, qx, rows):
    """GS butterfly on the second-minor axis via contiguous-half split.

    in/out < 2q."""
    nb = rows // (2 * t)
    shp = x.shape
    x6 = x.reshape(shp[:-2] + (nb, 2, t, shp[-1]))
    u = x6[..., 0, :, :]
    v = x6[..., 1, :, :]
    wb = _blocks(w_rows, nb)
    wbs = _blocks(ws_rows, nb)
    s = m31.csub2q(u + v, qx * 2)
    d = m31.mulmod_shoup_lazy(u + qx * 2 - v, wb, wbs, qx)
    out = jnp.stack([s, d], axis=-3)
    return out.reshape(shp)


def _bf_gs_z(x, w, ws, hi, t, q, rows, axis):
    """Forward GS on the lane axis, select-light form: in/out < 2q."""
    down = pltpu.roll(x, rows - t, axis)
    up = pltpu.roll(x, t, axis)
    hi_b = hi != 0
    s = m31.csub2q(x + down, q * 2)
    d = m31.mulmod_shoup_lazy(up + q * 2 - x, w, ws, q)
    return jnp.where(hi_b, d, s)


def _bf_ct_z(x, wz, wzs, hi, t, q, rows, axis):
    """Inverse CT on the lane axis via z-table (w at hi lanes, 1 at lo):
    in < 4q, out < 4q."""
    z = m31.mulmod_shoup_lazy(x, wz, wzs, q)  # < 2q everywhere
    zd = pltpu.roll(z, rows - t, axis)
    zu = pltpu.roll(z, t, axis)
    hi_b = hi != 0
    return jnp.where(hi_b, zu + q * 2 - z, z + zd)


def _kernel(direction, c1, logc1, q_ref,
            aw, aws, cw, cws, am, cm, twm, twms, x_ref, o_ref):
    """One formulation only (the "v2" split/z stage forms): the round-4
    prune of the PPLP_NTT_FORM env matrix (VERDICT r3 #4)."""
    q = q_ref[pl.program_id(0)]
    tile_b = x_ref.shape[1]
    x = x_ref[0].reshape(tile_b, c1, C2)
    if direction == "fwd":
        for s in range(logc1):
            t = c1 >> (s + 1)
            x = _bf_ct_split(x, aw[0, s], aws[0, s], t, q, c1)
        x = m31.mulmod_shoup_lazy(x, twm[0], twms[0], q)
        for s in range(_LOG_C2):
            t = C2 >> (s + 1)
            x = _bf_gs_z(x, cw[0, s], cws[0, s], cm[s], t, q, C2, 2)
    else:
        for s in range(_LOG_C2):
            t = 1 << s
            # cw/cws carry the z-tables (icwz/icwzs).
            x = _bf_ct_z(x, cw[0, s], cws[0, s], cm[s], t, q, C2, 2)
        x = m31.mulmod_shoup_lazy(x, twm[0], twms[0], q)
        for s in range(logc1):
            t = 1 << s
            x = _bf_gs_split(x, aw[0, s], aws[0, s], t, q, c1)
    o_ref[0] = m31.csub(x, q).reshape(tile_b, c1 * C2)


def _vtables(tb: FourStepTables) -> VmemNttTables:
    cached = getattr(tb, "_vmem_tables", None)
    if cached is None:
        cached = build_vmem_tables(tb)
        tb._vmem_tables = cached
    return cached


def _run(direction, x, tb: FourStepTables, tile_b: int, interpret=None):
    vt = _vtables(tb)
    *batch, L, n = x.shape
    assert L == tb.L and n == tb.n
    xb = x.reshape((-1, L, n))
    B = xb.shape[0]
    # Pad awkward batch sizes to a multiple of 8 instead of falling back to
    # one whole-batch tile (a prime B would otherwise blow the VMEM budget).
    pad = (-B) % 8 if B > tile_b else 0
    if pad:
        xb = jnp.concatenate(
            [xb, jnp.zeros((pad, L, n), xb.dtype)], axis=0
        )
    Bp = B + pad
    cands = [t for t in range(min(tile_b, Bp), 0, -1)
             if Bp % t == 0 and (t % 8 == 0 or t == Bp)]
    tile_b = cands[0] if cands else Bp
    xl = jnp.swapaxes(xb, 0, 1)  # [L, Bp, n]

    if direction == "fwd":
        aw, aws, cw, cws = vt.aw, vt.aws, vt.cw, vt.cws
        am, cm = vt.amask[0], vt.cmask[0]
        twm, twms = tb.tw, tb.tws
    else:
        aw, aws = vt.iaw, vt.iaws
        cw, cws = vt.icwz, vt.icwzs
        am, cm = vt.amask[1], vt.cmask[1]
        twm, twms = tb.itw, tb.itws

    vm = pltpu.VMEM
    c1 = tb.c1
    spec_a = pl.BlockSpec((1,) + aw.shape[1:], lambda l, b, *_: (l, 0, 0, 0), memory_space=vm)
    spec_c = pl.BlockSpec((1,) + cw.shape[1:], lambda l, b, *_: (l, 0, 0, 0), memory_space=vm)
    spec_am = pl.BlockSpec(am.shape, lambda l, b, *_: (0, 0, 0), memory_space=vm)
    spec_cm = pl.BlockSpec(cm.shape, lambda l, b, *_: (0, 0, 0), memory_space=vm)
    spec_tw = pl.BlockSpec((1, c1, C2), lambda l, b, *_: (l, 0, 0), memory_space=vm)
    spec_x = pl.BlockSpec((1, tile_b, n), lambda l, b, *_: (l, b, 0), memory_space=vm)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L, B // tile_b),
        in_specs=[spec_a, spec_a, spec_c, spec_c, spec_am, spec_cm,
                  spec_tw, spec_tw, spec_x],
        out_specs=spec_x,
    )
    out = pl.pallas_call(
        functools.partial(_kernel, direction, c1, tb.logc1),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((L, B, n), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=_interpret_default() if interpret is None else interpret,
    )(tb.q, aw, aws, cw, cws, am, cm, twm, twms, xl)
    out = jnp.swapaxes(out, 0, 1)
    if pad:
        out = out[:B]
    return out.reshape(x.shape)


def _default_tile_b(n: int) -> int:
    """Batch tile sized to the ~16MB scoped-VMEM stack budget: 32 rows at
    n<=4096 fits; n=8192 at 32 rows measured 58KB OVER the limit (Mosaic
    compile OOM), so halve the tile as n doubles."""
    return max(8, min(32, (32 * 4096) // n))


def forward_vmem(x, tb: FourStepTables, tile_b: int | None = None,
                 interpret=None):
    """x: [..., L, n] canonical residues -> spectra (internal vmem order)."""
    return _run("fwd", x, tb, tile_b or _default_tile_b(tb.n), interpret)


def inverse_vmem(x, tb: FourStepTables, tile_b: int | None = None,
                 interpret=None):
    return _run("inv", x, tb, tile_b or _default_tile_b(tb.n), interpret)
