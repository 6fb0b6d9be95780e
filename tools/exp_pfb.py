#!/usr/bin/env python
"""PFB FIR formulation experiments (r4: the polyphase FIR is ~54 ms of the
~133 ms fleet step at N=1024, W=98M — pfb_fir row of tools/profile_fleet.py —
versus ~2 ms of roofline HBM traffic).

Variants (all numerically checked against the current grouped conv):
  A  current        — regroup (reshape+flip+.T) + grouped conv (fgc=N)
  B  slicesum       — same branch-major xb, FIR as sum of tpp shifted slices
  C  timemajor      — NO transpose: vv [rows, N] stays time-major, column-
                      permuted taps, slice-sum over rows, DFT contracts the
                      branch axis LAST (dense [m,p]x[p,k] matmuls), final
                      einsum writes [k, m]
  P  pallas         — time-major FIR as a Pallas kernel, then C's DFT

Usage: python tools/exp_pfb.py [n_bins] [block_secs] [iters]
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(out):
    import jax
    leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "ravel")]
    np.asarray(leaves[-1].ravel()[:1])


def timeit(fn, *args, iters=5):
    out = fn(*args)
    _sync(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from sondetpu.dsp.channelizer import PFBChannelizer, _dft_axis0

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    block_secs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    fs_chan = 48000
    w = n * fs_chan * block_secs
    pfb = PFBChannelizer(n)
    tpp = pfb.tpp
    hbank = np.asarray(pfb._hbank)          # [N, tpp]
    st = pfb.init_state()

    rng = np.random.default_rng(0)
    x_i = jax.device_put(rng.normal(size=w).astype(np.float32))
    x_q = jax.device_put(rng.normal(size=w).astype(np.float32))
    st = jax.device_put(st)

    m_out = w // n
    rows = m_out + tpp - 1

    # ---------------- A: current -----------------------------------------
    tA, outA = timeit(lambda: pfb(st, x_i, x_q), iters=iters)
    _, yAi, yAq = outA
    print(f"A current   : {tA*1e3:8.2f} ms")

    # ---------------- B: branch-major slice-sum ---------------------------
    hb = jnp.asarray(hbank)

    def fir_slicesum(xb):
        acc = None
        for t in range(tpp):
            s = xb[:, tpp - 1 - t: tpp - 1 - t + m_out] * hb[:, t:t + 1]
            acc = s if acc is None else acc + s
        return acc

    @jax.jit
    def pfb_B(state, xi, xq):
        def branches(tail, x):
            xp = jnp.concatenate([tail, x])
            vv = xp.reshape(-1, n)
            xb = jnp.concatenate([vv[1:rows + 1, 0:1], vv[:rows, :0:-1]],
                                 axis=1).T
            return fir_slicesum(xb)
        u_i = branches(state.tail_i, xi)
        u_q = branches(state.tail_q, xq)
        u_i, u_q = jax.lax.optimization_barrier((u_i, u_q))
        return _dft_axis0(u_i, u_q, sign=1.0)

    tB, outB = timeit(lambda: pfb_B(st, x_i, x_q), iters=iters)
    errB = float(jnp.max(jnp.abs(outB[0] - yAi)))
    print(f"B slicesum  : {tB*1e3:8.2f} ms   max|err| {errB:.2e}")

    # ---------------- C: time-major, permuted taps, axis-last DFT ---------
    # column j holds branch p = 0 if j == 0 else N - j
    perm = np.zeros(n, np.int64)
    perm[1:] = n - np.arange(1, n)
    hcol = jnp.asarray(hbank[perm].T)       # [tpp, N] taps per column

    def dft_axis_last(ui, uq, sign=1.0, perm_in=None):
        """y[..., k] = sum_p u[..., p] e^{sign*2pi*i*pk/n}; u's last axis is
        the (optionally permuted) branch index. Direct matrix with the
        input permutation folded in (n <= 64 would recurse like
        _dft_axis0; here one permuted stage + mixed radix on the rest)."""
        nn = ui.shape[-1]
        p = perm_in if perm_in is not None else np.arange(nn)
        k = np.arange(nn)
        ang = sign * 2.0 * np.pi * np.outer(p, k) / nn
        c = jnp.asarray(np.cos(ang), jnp.float32)
        s = jnp.asarray(np.sin(ang), jnp.float32)
        # output [k, m]: einsum writes the transpose directly
        yi = jnp.einsum("mp,pk->km", ui, c) - jnp.einsum("mp,pk->km", uq, s)
        yq = jnp.einsum("mp,pk->km", uq, c) + jnp.einsum("mp,pk->km", ui, s)
        return yi, yq

    def dft_axis_last_mixed(ui, uq, sign=1.0):
        """Mixed-radix over the LAST axis: reshape [..., n] -> [..., n1, n2]
        with u[..., p1, p2] = u[..., p1 + n1*p2]; inner DFT over p2 (matmul),
        twiddle, outer DFT over p1; output index k = k1*n2 + k2 lands in
        [..., k1, k2] -> reshape. Mirrors _dft_axis0."""
        nn = ui.shape[-1]
        f = None
        for cand in range(2, min(nn, 65)):
            if nn % cand == 0:
                f = cand
        if nn <= 64 or f is None:
            k = np.arange(nn)
            ang = sign * 2.0 * np.pi * np.outer(k, k) / nn
            c = jnp.asarray(np.cos(ang), jnp.float32)
            s = jnp.asarray(np.sin(ang), jnp.float32)
            yi = ui @ c - uq @ s
            yq = uq @ c + ui @ s
            return yi, yq
        n1 = f
        n2 = nn // n1
        lead = ui.shape[:-1]
        u_ri = ui.reshape(lead + (n2, n1)).swapaxes(-1, -2)  # [..., n1, n2]
        u_rq = uq.reshape(lead + (n2, n1)).swapaxes(-1, -2)
        ai, aq = dft_axis_last_mixed(u_ri, u_rq, sign)       # [..., n1(p1), k2]
        k2 = np.arange(n2)
        p1 = np.arange(n1)
        ang = sign * 2.0 * np.pi * np.outer(p1, k2) / nn
        tc = jnp.asarray(np.cos(ang), jnp.float32)
        ts_ = jnp.asarray(np.sin(ang), jnp.float32)
        ti = ai * tc - aq * ts_
        tq = aq * tc + ai * ts_
        ang1 = sign * 2.0 * np.pi * np.outer(p1, p1) / n1
        c1 = jnp.asarray(np.cos(ang1), jnp.float32)
        s1 = jnp.asarray(np.sin(ang1), jnp.float32)
        # contract p1 (axis -2): y[..., k1, k2]
        yi = jnp.einsum("...pk,pd->...dk", ti, c1) - jnp.einsum(
            "...pk,pd->...dk", tq, s1)
        yq = jnp.einsum("...pk,pd->...dk", tq, c1) + jnp.einsum(
            "...pk,pd->...dk", ti, s1)
        return yi.reshape(lead + (nn,)), yq.reshape(lead + (nn,))

    @jax.jit
    def pfb_C(state, xi, xq):
        def branches_tm(tail, x):
            xp = jnp.concatenate([tail, x])
            vv = xp.reshape(-1, n)                       # [tpp+m_out, N]
            vvs = jnp.concatenate([vv[1:rows + 1, :1], vv[:rows, 1:]],
                                  axis=1)                # [rows, N]
            acc = None
            for t in range(tpp):
                s = vvs[tpp - 1 - t: tpp - 1 - t + m_out, :] * hcol[t][None, :]
                acc = s if acc is None else acc + s
            return acc                                   # [m_out, N] (perm'd)
        u_i = branches_tm(state.tail_i, xi)
        u_q = branches_tm(state.tail_q, xq)
        u_i, u_q = jax.lax.optimization_barrier((u_i, u_q))
        # undo the column permutation, then mixed-radix DFT over last axis
        inv = np.argsort(perm)
        u_i = u_i[:, inv]
        u_q = u_q[:, inv]
        yi, yq = dft_axis_last_mixed(u_i, u_q, sign=1.0)
        return yi.T, yq.T

    tC, outC = timeit(lambda: pfb_C(st, x_i, x_q), iters=iters)
    errC = float(jnp.max(jnp.abs(outC[0] - yAi)))
    print(f"C timemajor : {tC*1e3:8.2f} ms   max|err| {errC:.2e}")

    # ---------------- C2: time-major FIR only (attribution) --------------
    @jax.jit
    def fir_C(state, xi, xq):
        def branches_tm(tail, x):
            xp = jnp.concatenate([tail, x])
            vv = xp.reshape(-1, n)
            vvs = jnp.concatenate([vv[1:rows + 1, :1], vv[:rows, 1:]],
                                  axis=1)
            acc = None
            for t in range(tpp):
                s = vvs[tpp - 1 - t: tpp - 1 - t + m_out, :] * hcol[t][None, :]
                acc = s if acc is None else acc + s
            return acc
        return branches_tm(state.tail_i, xi), branches_tm(state.tail_q, xq)

    tC2, _ = timeit(lambda: fir_C(st, x_i, x_q), iters=iters)
    print(f"C2 fir only : {tC2*1e3:8.2f} ms")

    # ---------------- A2: grouped-conv FIR only --------------------------
    @jax.jit
    def fir_A(state, xi, xq):
        def branches(tail, x):
            xp = jnp.concatenate([tail, x])
            vv = xp.reshape(-1, n)
            xb = jnp.concatenate([vv[1:rows + 1, 0:1], vv[:rows, :0:-1]],
                                 axis=1).T
            u = jax.lax.conv_general_dilated(
                xb[None, :, :], hb[:, None, ::-1],
                window_strides=(1,), padding="VALID",
                dimension_numbers=("NCH", "OIH", "NCH"),
                feature_group_count=n)
            return u[0]
        return branches(state.tail_i, xi), branches(state.tail_q, xq)

    tA2, _ = timeit(lambda: fir_A(st, x_i, x_q), iters=iters)
    print(f"A2 conv only: {tA2*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
