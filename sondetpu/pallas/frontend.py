"""Fused FM-discriminator + DC-block + matched-FIR Pallas kernel.

One VMEM-resident pass per channel tile replaces three XLA stages (demod,
mean-subtract, FIR) that would each round-trip [C, n] float32 through HBM —
the fusion named in BASELINE.json:5 ("FM/GFSK quadrature demod, polyphase/
FIR matched filtering ... with Pallas kernels for the FIR ... and demod").

Inputs are I/Q planes plus the carried previous sample and audio tail;
output is the filtered audio block, bit-identical (up to float assoc.) to
the jnp path in runtime/pipeline.py.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_C = 8

# odd minimax polynomial for atan on [0, 1] (max err ~1e-6 rad)
_ATAN_C = (0.99997726, -0.33262347, 0.19354346, -0.11643287,
           0.05265332, -0.01172120)


def fast_atan2(y, x):
    """Polynomial atan2 (Pallas TPU has no atan2 primitive).

    Octant reduction + degree-11 odd minimax polynomial; max error ~1e-6 rad
    — far below the demod noise floor at any usable SNR.
    """
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    den = jnp.maximum(ax, ay)
    num = jnp.minimum(ax, ay)
    z = num / jnp.maximum(den, 1e-30)
    z2 = z * z
    c = _ATAN_C
    p = z * (c[0] + z2 * (c[1] + z2 * (c[2] + z2 * (c[3] + z2 * (c[4] + z2 * c[5])))))
    p = jnp.where(ay > ax, (jnp.pi / 2) - p, p)
    p = jnp.where(x < 0, jnp.pi - p, p)
    return jnp.where(y < 0, -p, p)


def _kernel(iq_i_ref, iq_q_ref, prev_ref, atail_ref, taps_ref, scale_ref,
            out_ref, tail_out_ref, *, ntaps: int, dc_block: bool):
    i = iq_i_ref[:]
    q = iq_q_ref[:]
    # one-sample-delayed copies with the carried previous sample
    ip = jnp.concatenate([prev_ref[:, 0:1], i[:, :-1]], axis=-1)
    qp = jnp.concatenate([prev_ref[:, 1:2], q[:, :-1]], axis=-1)
    dre = i * ip + q * qp
    dim = q * ip - i * qp
    audio = fast_atan2(dim, dre) * scale_ref[0, 0]
    if dc_block:
        audio = audio - jnp.mean(audio, axis=-1, keepdims=True)
    n = audio.shape[-1]
    ap = jnp.concatenate([atail_ref[:], audio], axis=-1)
    acc = jnp.zeros_like(audio)
    for k in range(ntaps):
        # y[m] = sum_k h[k] * ap[m + ntaps-1 - k]  (static slices only:
        # Pallas TPU has no dynamic_slice lowering)
        off = ntaps - 1 - k
        acc = acc + taps_ref[0, k] * ap[:, off:off + n]
    out_ref[:] = acc
    # next block's overlap-save carry: the (dc-removed) audio tail
    tail_out_ref[:] = audio[:, -(ntaps - 1):]


@functools.partial(jax.jit, static_argnames=("ntaps", "dc_block", "interpret"))
def fused_demod_fir(iq_i, iq_q, prev, atail, taps, scale, *,
                    ntaps: int, dc_block: bool = True, interpret: bool = False):
    """iq planes [C, n], prev [C, 2], atail [C, ntaps-1], taps [1, ntaps],
    scale [1, 1] -> (filtered audio [C, n], next audio tail [C, ntaps-1]).

    C must be a multiple of TILE_C (the pipeline pads its channel count).
    """
    c, n = iq_i.shape
    assert c % TILE_C == 0, c
    grid = (c // TILE_C,)

    kern = functools.partial(_kernel, ntaps=ntaps, dc_block=dc_block)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_C, n), lambda g: (g, 0)),
            pl.BlockSpec((TILE_C, n), lambda g: (g, 0)),
            pl.BlockSpec((TILE_C, 2), lambda g: (g, 0)),
            pl.BlockSpec((TILE_C, ntaps - 1), lambda g: (g, 0)),
            pl.BlockSpec((1, ntaps), lambda g: (0, 0)),
            pl.BlockSpec((1, 1), lambda g: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((TILE_C, n), lambda g: (g, 0)),
            pl.BlockSpec((TILE_C, ntaps - 1), lambda g: (g, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((c, n), jnp.float32),
            jax.ShapeDtypeStruct((c, ntaps - 1), jnp.float32),
        ),
        interpret=interpret,
    )(iq_i, iq_q, prev, atail, taps, scale)


# ---------------------------------------------------------------------------
# Full front-end kernel: channel filter + decimate + FM demod + matched FIR
# ---------------------------------------------------------------------------

HALO = 256   # full-rate history samples each chunk reads (>= decim*ntaps
             # + ntaps - 1 for the chanfilt+demod+matched chain; 256 keeps
             # the halo BlockSpec lane-aligned even at half rate, where the
             # decim=2 kernel's per-phase halo blocks are HALO//2 = 128)


def frontend_chunk(n: int, max_chunk: int = 4096):
    """Pick the time-chunk size for :func:`fused_frontend`.

    Chunks must be multiples of HALO; blocks that are not a multiple of the
    chunk are zero-padded in XLA and the outputs trimmed (fused_frontend
    handles both), so this returns the chunk minimizing the padded total
    ``ceil(n/chunk)*chunk`` (tie-break: larger chunk = fewer grid steps).
    E.g. the default 48000-sample block -> chunk 1024, 128 pad samples
    (0.27% waste). Returns None only for blocks shorter than HALO."""
    if n < HALO:
        return None
    best, best_pad = None, None
    for k in range(1, max_chunk // HALO + 1):
        ck = k * HALO
        padded = -(-n // ck) * ck
        if best_pad is None or padded <= best_pad:
            best, best_pad = ck, padded
    return best


def _frontend_kernel(body_i, body_q, halo_i, halo_q, tail_i, tail_q,
                     chan_taps, match_taps, scale_ref,
                     filt_ref, sum_ref, *, ntaps: int, valid: int | None):
    """One (channel-tile, time-chunk) grid cell of the fused front end
    (decim == 1; the strided variant is :func:`_frontend_kernel_d2`).

    Window = [HALO carried/previous samples | CHUNK new samples] at the
    full input rate; everything below runs in VMEM:
      channel filter -> FM quadrature discriminator (polynomial atan2)
      -> matched FIR -> CHUNK filtered outputs plus the per-chunk audio
      sum (for the block DC estimate, subtracted by the caller: the
      matched filter has unity DC gain so subtracting after filtering
      equals the jnp path's subtract-before). ``valid`` (set when the
      caller zero-padded the block to a chunk multiple) masks pad-region
      audio out of the DC sum.
    """
    j = pl.program_id(1)
    T = ntaps
    ckd = body_i.shape[-1]
    cp = ckd + T                    # chanfilt outputs incl. demod/FIR history

    hi = jnp.where(j == 0, tail_i[:], halo_i[:])
    hq = jnp.where(j == 0, tail_q[:], halo_q[:])
    xw_i = jnp.concatenate([hi, body_i[:]], axis=-1)   # [TC, HALO + ck]
    xw_q = jnp.concatenate([hq, body_q[:]], axis=-1)

    def chanfilt(xw):
        # cf[k] = sum_u hc[u] * x[P_k - u], P_k = j*ckd - T + k (decim == 1)
        acc = jnp.zeros((xw.shape[0], cp), jnp.float32)
        for u in range(T):
            b = HALO - T - u
            acc = acc + chan_taps[0, u] * xw[:, b: b + cp]
        return acc

    cf_i = chanfilt(xw_i)
    cf_q = chanfilt(xw_q)

    # FM quadrature discriminator over consecutive chanfilt outputs
    dre = cf_i[:, 1:] * cf_i[:, :-1] + cf_q[:, 1:] * cf_q[:, :-1]
    dim = cf_q[:, 1:] * cf_i[:, :-1] - cf_i[:, 1:] * cf_q[:, :-1]
    audio = fast_atan2(dim, dre) * scale_ref[0, 0]     # [TC, cp - 1]

    # matched FIR: filt[m] = sum_u hm[u] * audio[m + T - 1 - u]
    acc = jnp.zeros((audio.shape[0], ckd), jnp.float32)
    for u in range(T):
        o = T - 1 - u
        acc = acc + match_taps[0, u] * audio[:, o: o + ckd]
    filt_ref[:] = acc
    # this chunk's proc-rate audio sum for the block DC estimate; each grid
    # cell owns its own [TC, 1] output block (a dynamic lane store into a
    # shared block is not lowerable on TPU)
    sum_ref[:] = _dc_sum(audio[:, T - 1: T - 1 + ckd], j, ckd, valid)


_VMEM_LIMIT = 64 * 1024 * 1024   # raised scoped-VMEM limit (v5e has 128 MiB;
                                 # the 16 MiB default rejects 41-tap unrolled
                                 # kernels at useful channel tiles)
_VMEM_PER_ELEM = 400             # conservative Mosaic stack bytes per
                                 # (channel, sample) of a grid cell
_VMEM_BUDGET = 3 * _VMEM_LIMIT // 4

SUMW = 128   # lanes per per-chunk DC-sum cell: Mosaic requires output block
             # lane dims divisible by 128, so each grid cell owns a full
             # 128-lane block and broadcasts its scalar sum into it (the
             # caller reads lane 0); a (tc, 1) block is not lowerable


def _dc_sum(chunk_audio, j, ckd, valid):
    """Per-chunk audio sum, masking proc indices >= ``valid`` (pad region).

    Returns the sum broadcast across a [tc, SUMW] block."""
    if valid is not None:
        gidx = j * ckd + jax.lax.broadcasted_iota(jnp.int32, (1, ckd), 1)
        chunk_audio = jnp.where(gidx < valid, chunk_audio, 0.0)
    s = jnp.sum(chunk_audio, axis=-1, keepdims=True)
    return jnp.broadcast_to(s, (chunk_audio.shape[0], SUMW))


def _frontend_kernel_d2(be_i, bo_i, be_q, bo_q, he_i, ho_i, he_q, ho_q,
                        te_i, to_i, te_q, to_q,
                        chan_taps, match_taps, scale_ref,
                        filt_ref, sum_ref, *, ntaps: int, valid: int | None):
    """decim == 2 variant of :func:`_frontend_kernel`.

    Mosaic cannot lower the even/odd deinterleaving reshape inside a kernel
    ("unsupported shape cast"), so the caller deinterleaves the input planes
    in XLA and this kernel receives each plane as two half-rate phase
    arrays (even = full-rate index 2t, odd = 2t+1). Every slice below is
    contiguous. Output k at tap u reads full-rate window index
    b + 2k with b = HALO - 2T - u, i.e. phase ``u & 1`` at half-rate offset
    b//2 + k — identical arithmetic to the old in-kernel deinterleave.
    """
    j = pl.program_id(1)
    T = ntaps
    ckd = be_i.shape[-1]            # half-rate chunk length == ck // 2
    cp = ckd + T

    def window(t, h, b):
        return jnp.concatenate([jnp.where(j == 0, t[:], h[:]), b[:]], axis=-1)

    xe_i = window(te_i, he_i, be_i)  # [TC, HALO//2 + ckd]
    xo_i = window(to_i, ho_i, bo_i)
    xe_q = window(te_q, he_q, be_q)
    xo_q = window(to_q, ho_q, bo_q)

    def chanfilt(xe, xo):
        acc = jnp.zeros((xe.shape[0], cp), jnp.float32)
        for u in range(T):
            b = HALO - 2 * T - u       # local full-rate index at k=0
            h = chan_taps[0, u]
            x = xe if b % 2 == 0 else xo
            acc = acc + h * x[:, b // 2: b // 2 + cp]
        return acc

    cf_i = chanfilt(xe_i, xo_i)
    cf_q = chanfilt(xe_q, xo_q)

    dre = cf_i[:, 1:] * cf_i[:, :-1] + cf_q[:, 1:] * cf_q[:, :-1]
    dim = cf_q[:, 1:] * cf_i[:, :-1] - cf_i[:, 1:] * cf_q[:, :-1]
    audio = fast_atan2(dim, dre) * scale_ref[0, 0]     # [TC, cp - 1]

    acc = jnp.zeros((audio.shape[0], ckd), jnp.float32)
    for u in range(T):
        o = T - 1 - u
        acc = acc + match_taps[0, u] * audio[:, o: o + ckd]
    filt_ref[:] = acc
    sum_ref[:] = _dc_sum(audio[:, T - 1: T - 1 + ckd], j, ckd, valid)


def _deinterleave(x):
    """[C, n] -> even/odd phase planes ([C, n//2] each), in XLA."""
    c, n = x.shape
    xr = x.reshape(c, n // 2, 2)
    return xr[:, :, 0], xr[:, :, 1]


@functools.partial(jax.jit, static_argnames=("ntaps", "decim", "chunk",
                                             "dc_block", "interpret"))
def fused_frontend(iq_i, iq_q, tail_i, tail_q, chan_taps, match_taps, scale,
                   *, ntaps: int, decim: int, chunk: int,
                   dc_block: bool = True, interpret: bool = False):
    """Fused channel-filter + FM-demod + matched-FIR front end.

    ONE pallas_call over a (channel-tile, time-chunk) grid: each cell reads
    its aligned [TC, chunk] body plus a HALO-sample halo from the previous
    chunk (the carried raw tails for chunk 0), so HBM traffic is the two
    input planes once (+HALO/chunk) and the decimated output once — versus
    ~5 round-trips for the unfused XLA stages. Replaces the per-time-chunk
    pallas_call loop of the original fused_demod_fir (measured 7x slower:
    32 dispatches per block, each materializing an HBM slice).

    iq planes [C, n] float32 (chunk % HALO == 0; n is zero-padded in XLA
    up to a chunk multiple and the outputs trimmed, so any n >= decim
    works — the default 48000-sample block pads 128 samples);
    tails [C, HALO] raw input carry; taps [1, ntaps]; scale [1, 1].
    Returns (filt [C, n//decim], new_tail_i, new_tail_q, dc [C]) where dc
    is the block-mean audio — the FM discriminator DC the AFC loop feeds
    on (1.0 == spec.dev Hz of residual carrier offset), exported so AFC
    can coexist with the fused kernel.
    """
    c, n = iq_i.shape
    assert chunk % HALO == 0 and n % decim == 0, (n, chunk)
    assert decim * ntaps + ntaps - 1 <= HALO, (ntaps, decim)
    assert decim in (1, 2), decim
    # channel tile: biggest that keeps the Mosaic stack under the scoped
    # VMEM budget. The unrolled 41-tap loops keep ~ntaps live window slices,
    # measured ~330 B of scoped VMEM per (channel, sample) at ntaps=41
    # (20.85 MB at tc=64, chunk=1024), so bound tc*chunk accordingly.
    tc = 8
    for cand in (64, 32, 16):
        if c % cand == 0 and cand * chunk * _VMEM_PER_ELEM <= _VMEM_BUDGET:
            tc = cand
            break
    assert c % tc == 0, c
    # tails come from the REAL input; pad after
    new_tail_i, new_tail_q = iq_i[:, -HALO:], iq_q[:, -HALO:]
    n_valid = n // decim
    pad = -n % chunk
    if pad:
        iq_i = jnp.pad(iq_i, ((0, 0), (0, pad)))
        iq_q = jnp.pad(iq_q, ((0, 0), (0, pad)))
        n = n + pad
    valid = n_valid if pad else None   # mask pad audio out of the DC sums
    nchunks = n // chunk
    ckd = chunk // decim
    hblk = chunk // HALO
    params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel"),
        vmem_limit_bytes=_VMEM_LIMIT)
    taps_specs = [
        pl.BlockSpec((1, ntaps), lambda i, j: (0, 0)),
        pl.BlockSpec((1, ntaps), lambda i, j: (0, 0)),
        pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
    ]
    out_specs = (
        pl.BlockSpec((tc, ckd), lambda i, j: (i, j)),
        pl.BlockSpec((tc, SUMW), lambda i, j: (i, j)),
    )
    out_shape = (
        jax.ShapeDtypeStruct((c, n // decim), jnp.float32),
        jax.ShapeDtypeStruct((c, nchunks * SUMW), jnp.float32),
    )
    if decim == 2:
        # deinterleave in XLA (Mosaic can't reshape-deinterleave in-kernel);
        # each phase plane then flows through half-rate body/halo/tail specs
        planes = [p for x in (iq_i, iq_q) for p in _deinterleave(x)]
        tails = [p for t in (tail_i, tail_q) for p in _deinterleave(t)]
        hh = HALO // 2
        body = [pl.BlockSpec((tc, chunk // 2), lambda i, j: (i, j))
                for _ in range(4)]
        halo = [pl.BlockSpec((tc, hh),
                             lambda i, j: (i, jnp.maximum(j * hblk - 1, 0)))
                for _ in range(4)]
        tail = [pl.BlockSpec((tc, hh), lambda i, j: (i, 0)) for _ in range(4)]
        filt, sums = pl.pallas_call(
            functools.partial(_frontend_kernel_d2, ntaps=ntaps, valid=valid),
            grid=(c // tc, nchunks),
            in_specs=body + halo + tail + taps_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=params,
            interpret=interpret,
        )(*planes, *planes, *tails, chan_taps, match_taps, scale)
    else:
        kern = functools.partial(_frontend_kernel, ntaps=ntaps, valid=valid)
        filt, sums = pl.pallas_call(
            kern,
            grid=(c // tc, nchunks),
            in_specs=[
                pl.BlockSpec((tc, chunk), lambda i, j: (i, j)),
                pl.BlockSpec((tc, chunk), lambda i, j: (i, j)),
                pl.BlockSpec((tc, HALO),
                             lambda i, j: (i, jnp.maximum(j * hblk - 1, 0))),
                pl.BlockSpec((tc, HALO),
                             lambda i, j: (i, jnp.maximum(j * hblk - 1, 0))),
                pl.BlockSpec((tc, HALO), lambda i, j: (i, 0)),
                pl.BlockSpec((tc, HALO), lambda i, j: (i, 0)),
            ] + taps_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=params,
            interpret=interpret,
        )(iq_i, iq_q, iq_i, iq_q, tail_i, tail_q, chan_taps, match_taps, scale)
    if pad:
        filt = filt[:, :n_valid]
    per_chunk = sums.reshape(c, nchunks, SUMW)[:, :, 0]
    dc = jnp.sum(per_chunk, axis=-1) / n_valid
    if dc_block:
        filt = filt - dc[:, None]
    return filt, new_tail_i, new_tail_q, dc


# ---------------------------------------------------------------------------
# Dual-tone noncoherent FSK front-end kernel (m10 / ims100 / mrzn1)
# ---------------------------------------------------------------------------
#
# The optimal noncoherent receiver for high-deviation FSK (see
# runtime/pipeline.py dual-tone notes): mix the channel-filtered signal by
# -/+dev so the two FSK tones land at DC of the plus/minus plane pairs,
# matched-boxcar all four planes (one chip of integration), and take the
# normalized envelope difference as the soft chip metric. The jnp
# formulation round-trips [4C, n] mixed planes + [4C, n] filtered planes
# through HBM; this kernel fuses channel filter + mix + boxcar + envelope
# into ONE VMEM pass per (channel-tile, time-chunk) grid cell, and exports
# the per-chunk metric sums (block DC) and — when AFC is on — the
# power-weighted envelope-rotation sums the AFC discriminant needs (the lp
# planes never exist in HBM, so the kernel is the only place they can be
# accumulated).
#
# The +/-dev mixer tables are precomputed HOST-SIDE in float64 (on-device
# f32 trig at arguments ~1e5 rad loses everything to range reduction — the
# hardware-verified lesson in runtime/pipeline.py) and are periodic with
# the block (dev * n / fs_proc is integer, gated by the pipeline), so each
# chunk's window of [HALO history | chunk body] table values is a static
# slice of a host-built per-chunk table array.


def _dualtone_kernel(body_i, body_q, halo_i, halo_q, tail_i, tail_q,
                     tab_cos, tab_sin, chan_taps,
                     metric_ref, dc_ref, rot_re_ref, rot_im_ref,
                     *, ntaps: int, nb: int, valid, want_afc: bool,
                     skip_chanfilt: bool = False):
    j = pl.program_id(1)
    T = ntaps
    ck = body_i.shape[-1]
    # chanfilt outputs at positions k in [-nb, ck): nb-1 of boxcar history
    # for metric position 0, plus one more (position -1) for the AFC
    # boundary rotation pair
    cp = ck + nb

    hi = jnp.where(j == 0, tail_i[:], halo_i[:])
    hq = jnp.where(j == 0, tail_q[:], halo_q[:])
    # inputs may arrive bf16 (bf16 fleets feed the PFB dtype straight
    # through); all kernel arithmetic runs f32
    xw_i = jnp.concatenate([hi, body_i[:]],
                           axis=-1).astype(jnp.float32)  # [TC, HALO + ck]
    xw_q = jnp.concatenate([hq, body_q[:]], axis=-1).astype(jnp.float32)

    def chanfilt(xw):
        # cf[m] = sum_u hc[u] * x[P_m - u], P_m = j*ck + (m - nb)
        # window index of P_m: HALO + m - nb - u
        if skip_chanfilt:
            # wideband families (pipeline._skip_chanfilt): the guard
            # filter is transparent — pass raw samples through at the
            # same positions
            return xw[:, HALO - nb: HALO - nb + cp]
        acc = jnp.zeros((xw.shape[0], cp), jnp.float32)
        for u in range(T):
            b = HALO - nb - u
            acc = acc + chan_taps[0, u] * xw[:, b: b + cp]
        return acc

    cf_i = chanfilt(xw_i)
    cf_q = chanfilt(xw_q)

    # +/-dev mix: table window covers positions [-HALO, ck); position
    # k = m - nb is table index HALO + m - nb
    cv = tab_cos[:, HALO - nb: HALO - nb + cp]         # [1, cp]
    sv = tab_sin[:, HALO - nb: HALO - nb + cp]
    p_i = cf_i * cv + cf_q * sv      # +tone I  (x * e^{-j ang})
    p_q = cf_q * cv - cf_i * sv      # +tone Q
    m_i = cf_i * cv - cf_q * sv      # -tone I  (x * e^{+j ang})
    m_q = cf_q * cv + cf_i * sv      # -tone Q

    def box(p):
        # lp[m'] at position k = m' - 1 for m' in [0, ck+1):
        # mean of plane positions k-v, v in [0, nb) == plane array index
        # m' - 1 - v + nb
        acc = jnp.zeros((p.shape[0], ck + 1), jnp.float32)
        for v in range(nb):
            o = nb - 1 - v
            acc = acc + p[:, o: o + ck + 1]
        return acc * (1.0 / nb)

    lp_pi = box(p_i)                 # [TC, ck+1], positions [-1, ck)
    lp_pq = box(p_q)
    lp_mi = box(m_i)
    lp_mq = box(m_q)

    pp = lp_pi * lp_pi + lp_pq * lp_pq
    pm = lp_mi * lp_mi + lp_mq * lp_mq
    met_full = (pp - pm) / (pp + pm + 1e-12)           # positions [-1, ck)
    metric = met_full[:, 1:]
    metric_ref[:] = metric
    dc_ref[:] = _dc_sum(metric, j, ck, valid)

    if want_afc:
        # AFC discriminant partials: envelope-rotation products of adjacent
        # lp samples, pair (k, k-1) for global pair index t = j*ck + k.
        # The jnp reference sums pairs t in [1, n): mask out t == 0 (block
        # boundary — no previous sample) and the zero-pad region.
        a = (lp_pi[:, 1:] * lp_pi[:, :-1] + lp_pq[:, 1:] * lp_pq[:, :-1]
             + lp_mi[:, 1:] * lp_mi[:, :-1] + lp_mq[:, 1:] * lp_mq[:, :-1])
        b = (lp_pq[:, 1:] * lp_pi[:, :-1] - lp_pi[:, 1:] * lp_pq[:, :-1]
             + lp_mq[:, 1:] * lp_mi[:, :-1] - lp_mi[:, 1:] * lp_mq[:, :-1])
        t = j * ck + jax.lax.broadcasted_iota(jnp.int32, (1, ck), 1)
        keep = t >= 1
        if valid is not None:
            keep = keep & (t < valid)
        a = jnp.where(keep, a, 0.0)
        b = jnp.where(keep, b, 0.0)
        rr = jnp.sum(a, axis=-1, keepdims=True)
        ri = jnp.sum(b, axis=-1, keepdims=True)
        rot_re_ref[:] = jnp.broadcast_to(rr, (a.shape[0], SUMW))
        rot_im_ref[:] = jnp.broadcast_to(ri, (a.shape[0], SUMW))
    else:
        rot_re_ref[:] = jnp.zeros((metric.shape[0], SUMW), jnp.float32)
        rot_im_ref[:] = jnp.zeros((metric.shape[0], SUMW), jnp.float32)


@functools.partial(jax.jit, static_argnames=(
    "ntaps", "nb", "chunk", "dev_over_fs", "want_afc", "skip_chanfilt",
    "interpret"))
def fused_dualtone_frontend(iq_i, iq_q, tail_i, tail_q, chan_taps, *,
                            ntaps: int, nb: int, chunk: int,
                            dev_over_fs: float, want_afc: bool = False,
                            skip_chanfilt: bool = False,
                            interpret: bool = False):
    """Fused dual-tone noncoherent FSK front end.

    iq planes [C, n] float32 (post-DDC); tails [C, HALO] raw input carry;
    chan_taps [1, ntaps]. ``nb`` is the one-chip boxcar width
    (round(sps)); ``dev_over_fs`` = spec.dev / fs_proc (must make
    dev*n/fs integer — the pipeline gates this). Returns
    (metric [C, n], new_tail_i, new_tail_q, dc [C], rot_re [C],
    rot_im [C]): the RAW envelope metric (caller applies mean- or
    midpoint-DC), its block mean partials resolved to dc, and the AFC
    envelope-rotation sums (zeros unless want_afc).
    """
    c, n = iq_i.shape
    assert chunk % HALO == 0, chunk
    assert nb + ntaps - 1 <= HALO, (nb, ntaps)

    tc = 8
    for cand in (64, 32, 16):
        if c % cand == 0 and cand * chunk * _VMEM_PER_ELEM <= _VMEM_BUDGET:
            tc = cand
            break
    assert c % tc == 0, c

    new_tail_i, new_tail_q = iq_i[:, -HALO:], iq_q[:, -HALO:]
    n_valid = n
    pad = -n % chunk
    if pad:
        iq_i = jnp.pad(iq_i, ((0, 0), (0, pad)))
        iq_q = jnp.pad(iq_q, ((0, 0), (0, pad)))
        n = n + pad
    valid = n_valid if pad else None
    nchunks = n // chunk
    hblk = chunk // HALO

    # host-side f64 mixer tables, one [HALO + chunk] window per chunk.
    # Positions are signed sample indices relative to block start; the
    # table is periodic with n_valid (dev * n_valid / fs integer), so
    # negative (halo) positions wrap to the end of the block — exactly the
    # phase the previous block's tail samples carry.
    pos = np.arange(-HALO, chunk, dtype=np.int64)
    wins = []
    for jc in range(nchunks):
        p = (jc * chunk + pos) % n_valid
        frac = np.mod(p.astype(np.float64) * float(dev_over_fs), 1.0)
        wins.append(frac)
    frac_all = np.concatenate(wins)
    tab_cos = jnp.asarray(np.cos(2.0 * np.pi * frac_all),
                          jnp.float32)[None, :]
    tab_sin = jnp.asarray(np.sin(2.0 * np.pi * frac_all),
                          jnp.float32)[None, :]

    params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel"),
        vmem_limit_bytes=_VMEM_LIMIT)
    wlen = HALO + chunk
    metric, sums, rot_re, rot_im = pl.pallas_call(
        functools.partial(_dualtone_kernel, ntaps=ntaps, nb=nb,
                          valid=valid, want_afc=want_afc,
                          skip_chanfilt=skip_chanfilt),
        grid=(c // tc, nchunks),
        in_specs=[
            pl.BlockSpec((tc, chunk), lambda i, j: (i, j)),
            pl.BlockSpec((tc, chunk), lambda i, j: (i, j)),
            pl.BlockSpec((tc, HALO),
                         lambda i, j: (i, jnp.maximum(j * hblk - 1, 0))),
            pl.BlockSpec((tc, HALO),
                         lambda i, j: (i, jnp.maximum(j * hblk - 1, 0))),
            pl.BlockSpec((tc, HALO), lambda i, j: (i, 0)),
            pl.BlockSpec((tc, HALO), lambda i, j: (i, 0)),
            pl.BlockSpec((1, wlen), lambda i, j: (0, j)),
            pl.BlockSpec((1, wlen), lambda i, j: (0, j)),
            pl.BlockSpec((1, ntaps), lambda i, j: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((tc, chunk), lambda i, j: (i, j)),
            pl.BlockSpec((tc, SUMW), lambda i, j: (i, j)),
            pl.BlockSpec((tc, SUMW), lambda i, j: (i, j)),
            pl.BlockSpec((tc, SUMW), lambda i, j: (i, j)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((c, n), jnp.float32),
            jax.ShapeDtypeStruct((c, nchunks * SUMW), jnp.float32),
            jax.ShapeDtypeStruct((c, nchunks * SUMW), jnp.float32),
            jax.ShapeDtypeStruct((c, nchunks * SUMW), jnp.float32),
        ),
        compiler_params=params,
        interpret=interpret,
    )(iq_i, iq_q, iq_i, iq_q, tail_i, tail_q, tab_cos, tab_sin, chan_taps)

    if pad:
        metric = metric[:, :n_valid]
    dc = jnp.sum(sums.reshape(c, nchunks, SUMW)[:, :, 0], axis=-1) / n_valid
    rre = jnp.sum(rot_re.reshape(c, nchunks, SUMW)[:, :, 0], axis=-1)
    rim = jnp.sum(rot_im.reshape(c, nchunks, SUMW)[:, :, 0], axis=-1)
    return metric, new_tail_i, new_tail_q, dc, rre, rim

# ---------------------------------------------------------------------------
# AFSK tone-discriminator kernel (iMet-4 / SRS-C50), stage 2 of the fused
# AFSK front end
# ---------------------------------------------------------------------------
#
# The AFSK chain is chanfilt -> FM discriminator -> DC block -> dual-TONE
# discriminator on the AUDIO (mix by mark/space, one-symbol boxcar,
# normalized envelope difference; runtime/pipeline.py _afsk_frontend). The
# DC block needs the whole-block audio mean BEFORE the tone mix (the space
# tone's non-integer cycles/symbol leak a DC offset into its envelope), so
# the fused path runs TWO kernels inside one jit: fused_frontend with an
# identity matched filter produces the dc-subtracted audio (+ the mean for
# AFC), and this kernel fuses mix + boxcar + envelope — the stages whose
# jnp form round-trips four [C, n] mixed planes and four filtered planes
# through HBM.
#
# Mark/space LO tables are host-built f64 like the dual-tone mixer tables;
# the pipeline gates this path on block_len % L == 0 (L = the tones' joint
# period), which makes the carried LO phase identically zero and the
# tables periodic with the block (both imet4 (L=240) and c50 (L=20) pass
# at the standard 48 kHz block).


def _afsk_kernel(body, halo, tail, tab_mc, tab_msn, tab_sc, tab_ssn,
                 soft_ref, *, win: int):
    j = pl.program_id(1)
    ck = body.shape[-1]
    cp = ck + win - 1           # audio positions [-(win-1), ck)

    h = jnp.where(j == 0, tail[:], halo[:])
    xw = jnp.concatenate([h, body[:]], axis=-1)        # positions [-HALO, ck)
    a = xw[:, HALO - (win - 1):]                       # [TC, cp]

    def box(p):
        acc = jnp.zeros((p.shape[0], ck), jnp.float32)
        for v in range(win):
            o = win - 1 - v
            acc = acc + p[:, o: o + ck]
        return acc * (1.0 / win)

    energies = []
    for tc_, ts_ in ((tab_mc, tab_msn), (tab_sc, tab_ssn)):
        cv = tc_[:, HALO - (win - 1):]
        sv = ts_[:, HALO - (win - 1):]
        fi = box(a * cv)
        fq = box(a * sv)
        energies.append(fi * fi + fq * fq)
    em, es = energies
    soft_ref[:] = (em - es) / (em + es + 1e-9)


@functools.partial(jax.jit, static_argnames=(
    "win", "chunk", "fmark_over_fs", "fspace_over_fs", "interpret"))
def fused_afsk_frontend(audio, atail, *, win: int, chunk: int,
                        fmark_over_fs: float, fspace_over_fs: float,
                        interpret: bool = False):
    """Fused AFSK tone discriminator: dc-subtracted audio [C, n] ->
    (soft chips [C, n], new audio tail [C, HALO]).

    ``atail`` is the previous block's last HALO audio samples (dc-removed
    with THAT block's mean — the same values the jnp path's carried
    tone-filter tails were computed from). The LO tables assume zero
    carried phase: the caller gates on block_len % L == 0.
    """
    c, n = audio.shape
    assert chunk % HALO == 0, chunk
    assert win - 1 <= HALO, win

    # the win-tap unrolled boxcars (x4: two tones x I/Q) dominate this
    # kernel's Mosaic stack — measured ~1 KB per (channel, sample) at
    # win=40 (65 MB at tc=64, chunk=1024: scoped-vmem OOM on v5e), so the
    # per-element budget term scales with win
    per_elem = _VMEM_PER_ELEM + 16 * win
    tc = 8
    for cand in (64, 32, 16):
        if c % cand == 0 and cand * chunk * per_elem <= _VMEM_BUDGET:
            tc = cand
            break
    assert c % tc == 0, c

    new_atail = audio[:, -HALO:]
    n_valid = n
    pad = -n % chunk
    if pad:
        audio = jnp.pad(audio, ((0, 0), (0, pad)))
        n = n + pad
    nchunks = n // chunk
    hblk = chunk // HALO

    pos = np.arange(-HALO, chunk, dtype=np.int64)
    tabs = []
    for fof in (fmark_over_fs, fspace_over_fs):
        wins_c, wins_s = [], []
        for jc in range(nchunks):
            p = (jc * chunk + pos) % n_valid
            frac = np.mod(p.astype(np.float64) * float(fof), 1.0)
            wins_c.append(np.cos(2.0 * np.pi * frac))
            wins_s.append(np.sin(2.0 * np.pi * frac))
        tabs.append(jnp.asarray(np.concatenate(wins_c), jnp.float32)[None, :])
        tabs.append(jnp.asarray(np.concatenate(wins_s), jnp.float32)[None, :])
    tab_mc, tab_msn, tab_sc, tab_ssn = tabs

    params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel"),
        vmem_limit_bytes=_VMEM_LIMIT)
    wlen = HALO + chunk
    soft = pl.pallas_call(
        functools.partial(_afsk_kernel, win=win),
        grid=(c // tc, nchunks),
        in_specs=[
            pl.BlockSpec((tc, chunk), lambda i, j: (i, j)),
            pl.BlockSpec((tc, HALO),
                         lambda i, j: (i, jnp.maximum(j * hblk - 1, 0))),
            pl.BlockSpec((tc, HALO), lambda i, j: (i, 0)),
            pl.BlockSpec((1, wlen), lambda i, j: (0, j)),
            pl.BlockSpec((1, wlen), lambda i, j: (0, j)),
            pl.BlockSpec((1, wlen), lambda i, j: (0, j)),
            pl.BlockSpec((1, wlen), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((tc, chunk), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((c, n), jnp.float32),
        compiler_params=params,
        interpret=interpret,
    )(audio, audio, atail, tab_mc, tab_msn, tab_sc, tab_ssn)

    if pad:
        soft = soft[:, :n_valid]
    return soft, new_atail
