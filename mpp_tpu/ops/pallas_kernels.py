"""Pallas TPU kernels for the framework's hot sparse operators.

The production operators are batched per-column stencils ([ncol, nz]
state, offset-diagonal sparsity).  Three kernels:

* ``tridiag_spmv`` — single-pass y = T x.  5 HBM streams (4 read + 1
  write); the measured single-pass ceiling for this access mix on v5e is
  ~0.6 of nominal roofline (the pure elementwise 4r1w ceiling is ~0.86,
  and the fused stencil reaches ~0.85 of that).
* ``tridiag_spmv_chain`` — K chained SpMVs with the matrix RESIDENT in
  VMEM.  This is the shape of the actual solver hot loop: a Krylov or
  smoother iteration reuses the assembled Jacobian across every inner
  iteration (PETSc does the same — ``KSPSolve`` reads the AIJ arrays
  from cache across restarts).  Per-SpMV HBM traffic drops to 5/K
  streams and throughput becomes VPU-bound at ~7-8x the single-pass
  number (measured 5.7e11 nnz/s on v5e at K=30 — 4.6x the 5-stream
  CSR roofline).
* ``tridiag_jacobi_smooth`` — K weighted-Jacobi relaxation sweeps
  x += omega*(b - T x)/diag with T and b resident; the production
  preconditioner/smoother for the batched KSP path.

All kernels fall back to the jnp implementation on non-TPU backends and
for shapes the TPU layout cannot tile (ncol % block, nz % 128).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from mpp_tpu.ops.tridiag import tridiag_matvec


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon") or \
            "tpu" in jax.devices()[0].device_kind.lower()
    except Exception:
        return False


def _stencil(dl, d, du, xx):
    """One tridiagonal stencil application on a VMEM-resident block."""
    z = jnp.zeros_like(xx[:, :1])
    lo = jnp.concatenate([z, dl[:, 1:] * xx[:, :-1]], 1)
    hi = jnp.concatenate([du[:, :-1] * xx[:, 1:], z], 1)
    return d * xx + lo + hi


def tridiag_spmv(dl, d, du, x, block_cols: int = 1024):
    """Batched tridiagonal SpMV y = T x over [ncol, nz] arrays.

    Pallas kernel on TPU (single fused HBM pass), jnp elsewhere.
    ``ncol`` must be divisible by ``block_cols`` for the kernel path.
    """
    ncol, nz = x.shape
    if not _on_tpu() or ncol % block_cols or nz % 128:
        return tridiag_matvec(dl, d, du, x)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(dl_ref, d_ref, du_ref, x_ref, y_ref):
        y_ref[:] = _stencil(dl_ref[:], d_ref[:], du_ref[:], x_ref[:])

    bs = lambda: pl.BlockSpec((block_cols, nz), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((ncol, nz), x.dtype),
        grid=(ncol // block_cols,),
        in_specs=[bs(), bs(), bs(), bs()],
        out_specs=bs(),
    )(dl, d, du, x)


def tridiag_spmv_mixed(dl16, d16, du16, x, block_cols: int = 1024):
    """Mixed-precision single-pass y = T x: diagonals STORED bf16, state
    and compute f32 — the production Jacobian-action format for f32 TPU
    runs.

    Moves 14 B/cell instead of 20 (the 3 matrix streams halve), a
    measured ~34% wall-clock win on v5e at identical occupancy.  The
    ~3-decimal-digit loss on matrix ENTRIES is far inside Newton's
    inexact-direction tolerance: the action only feeds the BT
    line-search initslope F·(J Y) (alpha = 1e-4 acceptance fuzz) — the
    solve itself stays f32 (ops/tridiag.thomas).  f64/CPU paths never
    use this (parity runs keep full precision)."""
    ncol, nz = x.shape
    if not _on_tpu() or ncol % block_cols or nz % 128:
        return tridiag_matvec(dl16.astype(x.dtype), d16.astype(x.dtype),
                              du16.astype(x.dtype), x)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(dl_ref, d_ref, du_ref, x_ref, y_ref):
        xx = x_ref[:]
        d = d_ref[:].astype(xx.dtype)
        dl = dl_ref[:].astype(xx.dtype)
        du = du_ref[:].astype(xx.dtype)
        y_ref[:] = _stencil(dl, d, du, xx)

    bs = lambda: pl.BlockSpec((block_cols, nz), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((ncol, nz), x.dtype),
        grid=(ncol // block_cols,),
        in_specs=[bs(), bs(), bs(), bs()],
        out_specs=bs(),
    )(dl16, d16, du16, x)


def _thomas_block_cols(ncol: int, nz: int) -> int:
    """Column tile width for the Pallas Thomas kernel.

    VMEM cost: 5 double-buffered (C, nz_eff) pipeline blocks (nz pads
    to the 128-lane minimum) + 5 (nz, C) scratch buffers, within the
    16 MB budget.  C=2048 measures fastest on v5e at nz=64 and nz=128;
    wider tiles amortize the per-level sweep latency over more lanes."""
    nz_eff = max(nz, 128)
    c = 2048
    while c >= 128 and (5 * c * nz_eff * 4 * 2
                        + 5 * nz * c * 4) > 16 * 2 ** 20:
        c //= 2
    while c >= 128 and ncol % c:
        c //= 2
    return c


def pallas_thomas(dl, d, du, b):
    """Batched Thomas solve of [ncol, nz] tridiagonal systems — the
    production Newton-direction solver (CompiledVSFM._solve).

    The lax.scan formulation moves ~15x the minimum HBM traffic
    (transpose materialization + per-level stacked carries) and runs at
    ~0.06 of the 5-stream bytes-moved roofline on v5e.  This kernel
    streams each column tile into VMEM once, transposes in-register to
    put columns in lanes, runs the forward/backward sweeps entirely in
    VMEM scratch, and writes the solution back — 5 HBM streams total.
    Measured (BENCH_r04 ``thomas_kernel``, v5e): 0.42 of the 5-stream
    bytes-moved roofline at [16384, 64] and 0.61 at [16384, 128] —
    6-12x the scan form; the residual gap is the per-level dependency
    latency of the sweep, not HBM.  Perf numbers here cite the bench;
    re-measure with ``python bench.py`` before editing them.  Numerically it solves the same
    recurrence as ``ops.tridiag.thomas`` with one reciprocal per level
    (a*inv vs a/denom: equal to f32 rounding, not bitwise).

    Falls back to the scan implementation off-TPU, for f64 (parity runs
    solve on CPU), and for shapes the layout cannot tile.
    """
    from mpp_tpu.ops.tridiag import thomas as scan_thomas

    if d.ndim != 2 or d.dtype != jnp.float32 or not _on_tpu():
        return scan_thomas(dl, d, du, b)
    ncol, nz = d.shape
    C = _thomas_block_cols(ncol, nz)
    if C < 128 or nz % 8 or nz < 8:
        return scan_thomas(dl, d, du, b)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from jax import lax

    def kern(dl_ref, d_ref, du_ref, b_ref, x_ref, dlT, dT, duT, cp, bp):
        dlT[:] = dl_ref[:].T
        dT[:] = d_ref[:].T
        duT[:] = du_ref[:].T
        bp[:] = b_ref[:].T
        inv0 = 1.0 / dT[0:1, :]
        cp0 = duT[0:1, :] * inv0
        bp0 = bp[0:1, :] * inv0
        cp[0:1, :] = cp0
        bp[0:1, :] = bp0

        # the level-to-level recurrence rides the loop carry (registers)
        # so the critical path avoids the VMEM store->load latency; the
        # cp/bp rows are still stored for the backward sweep
        def fwd(k, carry):
            cpm, bpm = carry
            dlk = dlT[pl.ds(k, 1), :]
            inv = 1.0 / (dT[pl.ds(k, 1), :] - dlk * cpm)
            cpk = duT[pl.ds(k, 1), :] * inv
            bpk = (bp[pl.ds(k, 1), :] - dlk * bpm) * inv
            cp[pl.ds(k, 1), :] = cpk
            bp[pl.ds(k, 1), :] = bpk
            return (cpk, bpk)

        lax.fori_loop(1, nz, fwd, (cp0, bp0))

        # back substitution in place: bp becomes x
        def back(i, xn):
            k = nz - 2 - i
            xk = bp[pl.ds(k, 1), :] - cp[pl.ds(k, 1), :] * xn
            bp[pl.ds(k, 1), :] = xk
            return xk

        lax.fori_loop(0, nz - 1, back, bp[pl.ds(nz - 1, 1), :])
        x_ref[:] = bp[:].T

    bs = lambda: pl.BlockSpec((C, nz), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    scr = lambda: pltpu.VMEM((nz, C), d.dtype)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((ncol, nz), d.dtype),
        grid=(ncol // C,),
        in_specs=[bs(), bs(), bs(), bs()],
        out_specs=bs(),
        scratch_shapes=[scr() for _ in range(5)],
    )(dl, d, du, b)


def tridiag_spmv_chain(dl, d, du, x, iters: int, scale=1.0,
                       block_cols: int = 512):
    """y = (scale * T)^iters x with the matrix resident in VMEM.

    The chained power iteration every Krylov/smoother inner loop reduces
    to: each column block loads its 3 diagonals ONCE, then applies the
    stencil ``iters`` times entirely on-chip.  HBM traffic is 5 streams
    total instead of 5*iters.
    """
    ncol, nz = x.shape
    if not _on_tpu() or ncol % block_cols or nz % 128:
        def body(_, xc):
            return tridiag_matvec(dl, d, du, xc) * scale
        return jax.lax.fori_loop(0, iters, body, x)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(dl_ref, d_ref, du_ref, x_ref, y_ref):
        ll, dd, uu = dl_ref[:], d_ref[:], du_ref[:]

        def body(_, xx):
            return _stencil(ll, dd, uu, xx) * scale
        y_ref[:] = jax.lax.fori_loop(0, iters, body, x_ref[:])

    bs = lambda: pl.BlockSpec((block_cols, nz), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((ncol, nz), x.dtype),
        grid=(ncol // block_cols,),
        in_specs=[bs(), bs(), bs(), bs()],
        out_specs=bs(),
    )(dl, d, du, x)


def tridiag_jacobi_smooth(dl, d, du, b, x, iters: int, omega=2.0 / 3.0,
                          block_cols: int = 512):
    """K weighted-Jacobi sweeps x <- x + omega * (b - T x) / diag(T).

    Matrix and RHS stay resident in VMEM across all sweeps (6 HBM
    streams total).  The batched-KSP smoother/preconditioner for
    tridiagonal-dominant systems; exact jnp fallback elsewhere.
    """
    ncol, nz = x.shape

    def sweep(xx, ll, dd, uu, bb):
        return xx + omega * (bb - _stencil(ll, dd, uu, xx)) / dd

    if not _on_tpu() or ncol % block_cols or nz % 128:
        def body(_, xc):
            return sweep(xc, dl, d, du, b)
        return jax.lax.fori_loop(0, iters, body, x)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(dl_ref, d_ref, du_ref, b_ref, x_ref, y_ref):
        ll, dd, uu, bb = dl_ref[:], d_ref[:], du_ref[:], b_ref[:]

        def body(_, xx):
            return sweep(xx, ll, dd, uu, bb)
        y_ref[:] = jax.lax.fori_loop(0, iters, body, x_ref[:])

    bs = lambda: pl.BlockSpec((block_cols, nz), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((ncol, nz), x.dtype),
        grid=(ncol // block_cols,),
        in_specs=[bs()] * 5,
        out_specs=bs(),
    )(dl, d, du, b, x)


def pallas_block_thomas2(L, D, U, b, block_cols: int = 512,
                         interpret: bool = False):
    """Batched 2x2 BLOCK-tridiagonal solve — the TH production
    Newton-direction solver (CompiledTH._solve, interleaved [P_i, T_i]
    ordering of the coupled mass/energy system,
    ``soe/SystemOfEquationsTHType.F90:853-1005``).

    L/D/U: [ncol, n, 2, 2] blocks (L[:, 0] and U[:, n-1] unused),
    b: [ncol, n, 2]; returns x [ncol, n, 2].

    The ``lax.scan`` block sweep (ops/block_thomas) pays a per-level
    kernel-dispatch latency: at [8192 cols, 32 levels] the whole solve
    is ~12.5 ms while its arithmetic is microseconds.  This kernel
    follows the ``pallas_thomas`` design — stream a column tile's 14
    component planes into VMEM once, transpose in-register so levels
    index sublanes and columns ride lanes, run the forward/backward
    block recurrence with the carry in registers (closed-form 2x2
    adjugate solves, the ``small_solve`` m=2 form), write x back.

    Falls back to the scan implementation off-TPU, for f64, and for
    shapes the layout cannot tile.
    """
    from mpp_tpu.ops.block_thomas import block_thomas

    ncol, n = b.shape[0], b.shape[1]
    if b.dtype != jnp.float32 or (not _on_tpu() and not interpret) \
            or n % 8 or n < 8:
        return block_thomas(L, D, U, b)
    C = block_cols
    while C >= 128 and ncol % C:
        C //= 2
    if C < 128:
        return block_thomas(L, D, U, b)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from jax import lax

    comps = [L[..., i, j] for i in (0, 1) for j in (0, 1)] \
        + [D[..., i, j] for i in (0, 1) for j in (0, 1)] \
        + [U[..., i, j] for i in (0, 1) for j in (0, 1)] \
        + [b[..., 0], b[..., 1]]

    def kern(l00r, l01r, l10r, l11r, d00r, d01r, d10r, d11r,
             u00r, u01r, u10r, u11r, b0r, b1r, x0r, x1r,
             cp00, cp01, cp10, cp11, dp0, dp1,
             l00, l01, l10, l11, d00, d01, d10, d11,
             u00, u01, u10, u11, b0s, b1s):
        for dst, src in ((l00, l00r), (l01, l01r), (l10, l10r),
                         (l11, l11r), (d00, d00r), (d01, d01r),
                         (d10, d10r), (d11, d11r), (u00, u00r),
                         (u01, u01r), (u10, u10r), (u11, u11r),
                         (b0s, b0r), (b1s, b1r)):
            dst[:] = src[:].T

        def fwd(k, carry):
            cp00m, cp01m, cp10m, cp11m, dp0m, dp1m = carry
            live = (k > 0).astype(jnp.float32)
            lk00 = l00[pl.ds(k, 1), :] * live
            lk01 = l01[pl.ds(k, 1), :] * live
            lk10 = l10[pl.ds(k, 1), :] * live
            lk11 = l11[pl.ds(k, 1), :] * live
            a = d00[pl.ds(k, 1), :] - (lk00 * cp00m + lk01 * cp10m)
            bb = d01[pl.ds(k, 1), :] - (lk00 * cp01m + lk01 * cp11m)
            c = d10[pl.ds(k, 1), :] - (lk10 * cp00m + lk11 * cp10m)
            dd = d11[pl.ds(k, 1), :] - (lk10 * cp01m + lk11 * cp11m)
            r0 = b0s[pl.ds(k, 1), :] - (lk00 * dp0m + lk01 * dp1m)
            r1 = b1s[pl.ds(k, 1), :] - (lk10 * dp0m + lk11 * dp1m)
            idet = 1.0 / (a * dd - bb * c)
            uk00 = u00[pl.ds(k, 1), :]
            uk01 = u01[pl.ds(k, 1), :]
            uk10 = u10[pl.ds(k, 1), :]
            uk11 = u11[pl.ds(k, 1), :]
            cp00k = (dd * uk00 - bb * uk10) * idet
            cp01k = (dd * uk01 - bb * uk11) * idet
            cp10k = (a * uk10 - c * uk00) * idet
            cp11k = (a * uk11 - c * uk01) * idet
            dp0k = (dd * r0 - bb * r1) * idet
            dp1k = (a * r1 - c * r0) * idet
            cp00[pl.ds(k, 1), :] = cp00k
            cp01[pl.ds(k, 1), :] = cp01k
            cp10[pl.ds(k, 1), :] = cp10k
            cp11[pl.ds(k, 1), :] = cp11k
            dp0[pl.ds(k, 1), :] = dp0k
            dp1[pl.ds(k, 1), :] = dp1k
            return (cp00k, cp01k, cp10k, cp11k, dp0k, dp1k)

        z = jnp.zeros((1, C), jnp.float32)
        lax.fori_loop(0, n, fwd, (z, z, z, z, z, z))

        # back substitution in place: dp becomes x
        def back(i, xn):
            x0n, x1n = xn
            k = n - 2 - i
            x0k = dp0[pl.ds(k, 1), :] - (cp00[pl.ds(k, 1), :] * x0n
                                         + cp01[pl.ds(k, 1), :] * x1n)
            x1k = dp1[pl.ds(k, 1), :] - (cp10[pl.ds(k, 1), :] * x0n
                                         + cp11[pl.ds(k, 1), :] * x1n)
            dp0[pl.ds(k, 1), :] = x0k
            dp1[pl.ds(k, 1), :] = x1k
            return (x0k, x1k)

        lax.fori_loop(0, n - 1, back,
                      (dp0[pl.ds(n - 1, 1), :], dp1[pl.ds(n - 1, 1), :]))
        x0r[:] = dp0[:].T
        x1r[:] = dp1[:].T

    bs = lambda: pl.BlockSpec((C, n), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    scr = lambda: pltpu.VMEM((n, C), jnp.float32)
    x0, x1 = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((ncol, n), jnp.float32)] * 2,
        grid=(ncol // C,),
        in_specs=[bs() for _ in range(14)],
        out_specs=[bs(), bs()],
        scratch_shapes=[scr() for _ in range(20)],
        interpret=interpret,
    )(*comps)
    return jnp.stack([x0, x1], axis=-1)
