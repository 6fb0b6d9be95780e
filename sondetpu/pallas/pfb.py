"""Pallas TPU kernel: the polyphase filter-bank branch FIR, time-major.

The PFB's per-branch tpp-tap FIR is pure data movement (8 MACs per sample)
but its natural XLA lowerings are far off the HBM roofline at fleet shapes
(N=1024, W=98M, measured r4): the grouped conv (feature_group_count=N)
costs ~54 ms and an elementwise sum-of-shifted-slices ~40 ms, versus ~4 ms
of in+out traffic at ~800 GB/s. This kernel streams the reshaped wideband
block through VMEM exactly once per plane:

  input  vv  [tpp + m_out, N]   the raw block reshaped time-major
                                (vv[r, j] = xp[r*N + j] — a free reshape)
  output u_t [m_out, N]         branch-PERMUTED polyphase partial sums:
                                u_t[m, j] = u_branch[(N - j) % N, m]

Column j of vv holds the window samples of branch p = (N-j) % N (branch 0
shifted one row — handled in-kernel on the j==0 lane), so no transpose and
no gather ever touches HBM; the downstream DFT absorbs the permutation for
free because index reversal mod N flips the DFT's sign:
  sum_j u_t[j] e^{-2pi i jk/N} = sum_p u[p] e^{+2pi i pk/N}.

Grid: (m_out/TM, N/TN) output tiles; the tpp-row halo below each tile is a
second BlockSpec over the same array (an 8-row strip, ~tpp/TM extra reads).
Both I/Q planes ride one kernel so the taps tile is fetched once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(h_ref, vim_ref, vih_ref, vqm_ref, vqh_ref, ui_ref, uq_ref,
            *, tm: int, tpp: int):
    j = pl.program_id(1)

    def fir(main, halo, shift):
        acc = None
        for t in range(tpp):
            o = tpp - 1 - t + shift
            if o == 0:
                win = main[:]
            else:
                win = jnp.concatenate([main[o:tm], halo[:o]], axis=0)
            s = win * h_ref[t][None, :]
            acc = s if acc is None else acc + s
        return acc

    acc_i = fir(vim_ref, vih_ref, 0)
    acc_q = fir(vqm_ref, vqh_ref, 0)

    @pl.when(j > 0)
    def _():
        ui_ref[:] = acc_i
        uq_ref[:] = acc_q

    @pl.when(j == 0)
    def _():
        # branch 0 (lane 0 of the first column tile) taps one row later:
        # xb[0, m] = vv[m + 1, 0] (dsp/channelizer.py regroup identity)
        s_i = fir(vim_ref, vih_ref, 1)
        s_q = fir(vqm_ref, vqh_ref, 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, acc_i.shape, 1)
        ui_ref[:] = jnp.where(lane == 0, s_i, acc_i)
        uq_ref[:] = jnp.where(lane == 0, s_q, acc_q)


_TM_CANDIDATES = (512, 480, 384, 256, 192, 128, 96, 64, 32, 16, 8)


def tile_shape(m_out: int, n: int, tpp: int = 8):
    """(TM, TN) for the kernel grid, or None if the shape doesn't tile
    (callers fall back to the XLA slice-sum formulation). TM must divide
    m_out AND be a multiple of tpp — the halo strip's block index is in
    units of its own tpp-row block shape, so a TM % tpp != 0 choice would
    silently read the wrong halo rows."""
    if n % 128:
        return None
    tn = 256 if n % 256 == 0 else 128
    for tm in _TM_CANDIDATES:
        if m_out % tm == 0 and tm % tpp == 0:
            return tm, tn
    return None


@functools.partial(jax.jit, static_argnames=("tpp", "tm", "tn", "interpret"))
def pfb_fir_timemajor(vv_i: jax.Array, vv_q: jax.Array, hcol: jax.Array,
                      tpp: int, tm: int, tn: int, interpret: bool = False):
    """vv planes [tpp + m_out, N] + column taps hcol [tpp, N] ->
    (u_i, u_q) [m_out, N], branch-permuted time-major (see module doc)."""
    rows, n = vv_i.shape
    m_out = rows - tpp
    grid = (m_out // tm, n // tn)
    # main tile rows [i*TM, i*TM+TM); halo strip rows [i*TM+TM, i*TM+TM+tpp)
    # — the strip's block index is in units of its OWN tpp-row block shape,
    # so TM must be a multiple of tpp (every _TM_CANDIDATES entry is)
    main_spec = pl.BlockSpec((tm, tn), lambda i, j: (i, j))
    halo_spec = pl.BlockSpec(
        (tpp, tn), lambda i, j: (i * (tm // tpp) + tm // tpp, j))
    taps_spec = pl.BlockSpec((tpp, tn), lambda i, j: (0, j))
    out_spec = pl.BlockSpec((tm, tn), lambda i, j: (i, j))
    return pl.pallas_call(
        functools.partial(_kernel, tm=tm, tpp=tpp),
        grid=grid,
        in_specs=[taps_spec, main_spec, halo_spec, main_spec, halo_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((m_out, n), vv_i.dtype)] * 2,
        interpret=interpret,
    )(hcol, vv_i, vv_i, vv_q, vv_q)
