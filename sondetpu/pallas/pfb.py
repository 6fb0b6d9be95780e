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


def _kernel_stream(h_ref, ti_ref, tq_ref, pim_ref, xim_ref, pqm_ref,
                   xqm_ref, ui_ref, uq_ref, *, tm: int, tpp: int, cdt):
    """Streaming twin of :func:`_kernel`: the block's raw planes and the
    carry tail enter as SEPARATE refs (no host-side concat pass) and the
    compute-dtype cast happens on the VMEM read (no host-side cast pass) —
    together those two elementwise passes measured ~13 ms of the 2048-bin
    fleet PFB. Window rows [o, o+TM) of the virtual vv = concat(tail, x)
    split as prev[o:tpp] ++ main[:TM-(tpp-o)]; prev is the previous x
    row-block except at i == 0 where it is the carry tail (the clamped
    prev block loads valid-but-unused rows there)."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    def plane(xm_ref, pm_ref, tail_ref):
        main = xm_ref[:].astype(cdt)
        prev = jnp.where(i == 0, tail_ref[:].astype(cdt),
                         pm_ref[:].astype(cdt))

        def fir(shift):
            acc = None
            for t in range(tpp):
                o = tpp - 1 - t + shift
                if o == tpp:
                    win = main
                else:
                    win = jnp.concatenate([prev[o:], main[:tm - (tpp - o)]],
                                          axis=0)
                s = win * h_ref[t][None, :].astype(cdt)
                acc = s if acc is None else acc + s
            return acc

        return fir

    fir_i = plane(xim_ref, pim_ref, ti_ref)
    fir_q = plane(xqm_ref, pqm_ref, tq_ref)
    acc_i = fir_i(0)
    acc_q = fir_q(0)

    @pl.when(j > 0)
    def _():
        ui_ref[:] = acc_i
        uq_ref[:] = acc_q

    @pl.when(j == 0)
    def _():
        # branch 0 (lane 0 of the first column tile) taps one row later
        s_i = fir_i(1)
        s_q = fir_q(1)
        lane = jax.lax.broadcasted_iota(jnp.int32, acc_i.shape, 1)
        ui_ref[:] = jnp.where(lane == 0, s_i, acc_i)
        uq_ref[:] = jnp.where(lane == 0, s_q, acc_q)


@functools.partial(jax.jit, static_argnames=("tpp", "tm", "tn", "cdt",
                                             "interpret"))
def pfb_fir_stream(x_i: jax.Array, x_q: jax.Array, tail_i: jax.Array,
                   tail_q: jax.Array, hcol: jax.Array, tpp: int, tm: int,
                   tn: int, cdt=jnp.float32, interpret: bool = False):
    """Raw block planes [m_out, N] (any dtype; cast to ``cdt`` in VMEM) +
    carry tail [tpp, N] + column taps [tpp, N] -> (u_i, u_q) [m_out, N] in
    ``cdt``, branch-permuted time-major. Numerically identical to
    pfb_fir_timemajor over concat(tail, x) pre-cast to ``cdt``."""
    m_out, n = x_i.shape
    grid = (m_out // tm, n // tn)
    main_spec = pl.BlockSpec((tm, tn), lambda i, j: (i, j))
    # prev strip: x rows [i*TM - tpp, i*TM) in units of its own tpp-row
    # block shape; clamped at the first tile where the tail ref takes over
    prev_spec = pl.BlockSpec(
        (tpp, tn), lambda i, j: (jnp.maximum(i * (tm // tpp) - 1, 0), j))
    tail_spec = pl.BlockSpec((tpp, tn), lambda i, j: (0, j))
    taps_spec = pl.BlockSpec((tpp, tn), lambda i, j: (0, j))
    out_spec = pl.BlockSpec((tm, tn), lambda i, j: (i, j))
    return pl.pallas_call(
        functools.partial(_kernel_stream, tm=tm, tpp=tpp, cdt=cdt),
        grid=grid,
        in_specs=[taps_spec, tail_spec, tail_spec, prev_spec, main_spec,
                  prev_spec, main_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((m_out, n), cdt)] * 2,
        interpret=interpret,
    )(hcol, tail_i, tail_q, x_i, x_i, x_q, x_q)


# ---------------------------------------------------------------------------
# DFT-across-branches kernel (the PFB's second stage), lane-aligned and
# channel-permuted.
#
# The XLA mixed-radix DFT (dsp/channelizer.py:_dft_axis_last) measured
# 36 ms at [192000, 2048] bf16 on v5e — 9x its HBM floor — because every
# stage materializes reshaped/swapaxed intermediates and the sub-128-lane
# matmuls pad. This kernel factors N = GR * L with L a lane-tile multiple
# (GR=4 whenever N % 512 == 0, so the stage-1 twiddles e^{-2pi i g a / 4}
# are all 0/+-1: pure VPU adds), keeps a [TM, N] row tile resident in VMEM,
# and runs stage 2 as GR [TM, L] x [L, L] MXU matmuls per tile:
#
#   j = g*L + l,  k = a + GR*b   (g, a in [0, GR); l, b in [0, L))
#   v_a[l]      = sum_g u[g*L + l] * e^{-2pi i g a / GR}     (VPU, 0/+-1)
#   y[a + GR*b] = sum_l v_a[l]   * W_a[l, b],                (MXU, K = L)
#                 W_a[l, b] = e^{-2pi i l (a + GR*b) / N}
#
# The output is written TRANSPOSED ([N, m] channel-major — the in-kernel
# [TM, L] tile transposes measured FREE on v5e: 10.3 vs 9.6 ms/pass
# against the row-major variant, while the downstream XLA transpose they
# replace was 17 ms) and CHANNEL-PERMUTED: channel k sits at row
# q = (k % GR) * L + k // GR (each a's matmul writes its own row strip).
# The fleet's fused step absorbs the permutation into its baked bin-gather
# indices (zero cost); the standalone path undoes it with one cheap
# leading-axes transpose of the [GR, L, m] view — the same
# absorb-the-permutation trick the FIR kernel plays with the branch
# permutation and the DFT sign.
# ---------------------------------------------------------------------------


def dft_perm(n: int, gr: int):
    """Row position of each channel in the kernel's permuted output:
    perm[k] = (k % gr) * (n // gr) + k // gr."""
    import numpy as np
    k = np.arange(n)
    return (k % gr) * (n // gr) + k // gr


def dft_tile(m: int, n: int, itemsize: int = 2):
    """(GR, TM) for the DFT kernel grid, or None when the shape doesn't
    fit (callers fall back to the XLA mixed-radix path). GR=4 is preferred
    (stage-1 twiddles all 0/+-1: pure adds); GR=8 quarters the stage-2
    weight planes when GR=4's don't fit (f32 at n=2048). The budget model
    is MEASURED, not guessed: Mosaic double-buffers the in/out blocks AND
    the constant-index weight blocks (a 256-row bf16 tile at n=2048
    allocated 19.24M against the 16M scoped limit), so every term below
    carries the x2."""
    for gr in (4, 8):
        l = n // gr
        if l % 128 or n % gr:
            continue
        for tm in (256, 192, 128, 96, 64, 32):
            if m % tm:
                continue
            budget = (8 * tm * n        # in+out planes, double-buffered
                      + 4 * n * l       # cos/sin weights, double-buffered
                      + 2 * tm * n      # v + y live values
                      ) * itemsize
            if budget <= 14 * 1024 * 1024:
                return gr, tm
    return None


def _dft_kernel(wc_ref, ws_ref, ui_ref, uq_ref, yi_ref, yq_ref,
                *, gr: int, l: int, c1, s1):
    ui = ui_ref[:]
    uq = uq_ref[:]
    for a in range(gr):
        vi = None
        vq = None
        for g in range(gr):
            c = float(c1[g, a])
            s = float(s1[g, a])
            ug_i = ui[:, g * l:(g + 1) * l]
            ug_q = uq[:, g * l:(g + 1) * l]
            # v = u * e^{-2pi i g a / gr} = u * (c - i s); with gr in
            # (2, 4) every (c, s) is 0/+-1 and no multiply is emitted
            for acc, term in (("vi", _cs_term(ug_i, c, ug_q, s)),
                              ("vq", _cs_term(ug_q, c, ug_i, -s))):
                if term is None:
                    continue
                if acc == "vi":
                    vi = term if vi is None else vi + term
                else:
                    vq = term if vq is None else vq + term
        wc = wc_ref[a * l:(a + 1) * l, :]
        ws = ws_ref[a * l:(a + 1) * l, :]
        yi = (jnp.dot(vi, wc, preferred_element_type=jnp.float32)
              + jnp.dot(vq, ws, preferred_element_type=jnp.float32))
        yq = (jnp.dot(vq, wc, preferred_element_type=jnp.float32)
              - jnp.dot(vi, ws, preferred_element_type=jnp.float32))
        yi_ref[a * l:(a + 1) * l, :] = yi.T.astype(yi_ref.dtype)
        yq_ref[a * l:(a + 1) * l, :] = yq.T.astype(yq_ref.dtype)


def _cs_term(x_c, c, x_s, s):
    """c * x_c + s * x_s with 0/+-1 coefficients emitted as adds."""
    def scaled(x, w):
        if abs(w) < 1e-12:
            return None
        if abs(w - 1.0) < 1e-12:
            return x
        if abs(w + 1.0) < 1e-12:
            return -x
        return x * w
    a = scaled(x_c, c)
    b = scaled(x_s, s)
    if a is None:
        return b
    if b is None:
        return a
    return a + b


@functools.partial(jax.jit, static_argnames=("gr", "tm", "interpret"))
def pfb_dft_perm(u_i: jax.Array, u_q: jax.Array, wc: jax.Array,
                 ws: jax.Array, gr: int, tm: int, interpret: bool = False):
    """Branch-permuted FIR planes [m, N] -> channel-major, channel-PERMUTED
    DFT planes [N, m] (channel k at row dft_perm(N, gr)[k]); wc/ws are the
    stacked stage-2 weights [N, N//gr] from :func:`dft_weights`."""
    import numpy as np
    m, n = u_i.shape
    l = n // gr
    ga = np.arange(gr)
    ang1 = 2.0 * np.pi * np.outer(ga, ga) / gr
    c1, s1 = np.cos(ang1), np.sin(ang1)
    in_spec = pl.BlockSpec((tm, n), lambda i: (i, 0))
    w_spec = pl.BlockSpec((n, l), lambda i: (0, 0))
    out_spec = pl.BlockSpec((n, tm), lambda i: (0, i))
    return pl.pallas_call(
        functools.partial(_dft_kernel, gr=gr, l=l, c1=c1, s1=s1),
        grid=(m // tm,),
        in_specs=[w_spec, w_spec, in_spec, in_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((n, m), u_i.dtype)] * 2,
        interpret=interpret,
    )(wc, ws, u_i, u_q)


def dft_weights(n: int, gr: int):
    """Stage-2 weight planes [N, L]: rows a*L + l hold
    W_a[l, b] = e^{-2pi i l (a + gr*b) / n} (cos, sin)."""
    import numpy as np
    l_sz = n // gr
    a = np.arange(gr)[:, None, None]
    l = np.arange(l_sz)[None, :, None]
    b = np.arange(l_sz)[None, None, :]
    ang = 2.0 * np.pi * l * (a + gr * b) / n
    return (np.cos(ang).reshape(n, l_sz).astype(np.float32),
            np.sin(ang).reshape(n, l_sz).astype(np.float32))
