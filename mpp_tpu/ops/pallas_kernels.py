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

import functools

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
    """Largest power-of-two column tile dividing ncol that keeps the
    kernel's ~10 (nz, C) f32 buffers inside the 16 MB VMEM budget.
    C = 1024 measures fastest on v5e for nz <= 128 (0.82 of the
    5-stream bytes-moved roofline); halve for deeper columns."""
    budget = 8 * 1024 * 1024 // (10 * nz * 4)
    c = 1024
    while c > budget:
        c //= 2
    while c >= 128 and ncol % c:
        c //= 2
    return c


def pallas_thomas(dl, d, du, b):
    """Batched Thomas solve of [ncol, nz] tridiagonal systems — the
    production Newton-direction solver (CompiledVSFM._solve).

    The lax.scan formulation moves ~15x the minimum HBM traffic
    (transpose materialization + per-level stacked carries) and runs at
    ~0.07 of the 5-stream bytes-moved roofline on v5e.  This kernel
    streams each column tile into VMEM once, transposes in-register to
    put columns in lanes, runs the forward/backward sweeps entirely in
    VMEM scratch, and writes the solution back — 5 HBM streams total,
    measured 0.82 of the bytes-moved roofline at [16384, 64] (31.2 us
    vs the scan's 390 us).  Bitwise-equal ordering of operations per
    level gives results identical to ``ops.tridiag.thomas`` in f32.

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
        cp[0:1, :] = duT[0:1, :] * inv0
        bp[0:1, :] = bp[0:1, :] * inv0

        def fwd(k, _):
            cpm = cp[pl.ds(k - 1, 1), :]
            bpm = bp[pl.ds(k - 1, 1), :]
            dlk = dlT[pl.ds(k, 1), :]
            inv = 1.0 / (dT[pl.ds(k, 1), :] - dlk * cpm)
            cp[pl.ds(k, 1), :] = duT[pl.ds(k, 1), :] * inv
            bp[pl.ds(k, 1), :] = (bp[pl.ds(k, 1), :] - dlk * bpm) * inv
            return 0

        lax.fori_loop(1, nz, fwd, 0)

        # back substitution in place: bp becomes x
        def back(i, _):
            k = nz - 2 - i
            xn = bp[pl.ds(k + 1, 1), :]
            bp[pl.ds(k, 1), :] = bp[pl.ds(k, 1), :] \
                - cp[pl.ds(k, 1), :] * xn
            return 0

        lax.fori_loop(0, nz - 1, back, 0)
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
