"""Experiment: SpMV kernel variants vs stream ceiling on the TPU chip.

Not part of the framework — a measurement harness for tuning
ops/pallas_kernels.py.  Round-3 findings on v5e (recorded so the next
tuner doesn't re-walk the tree):

* pure-elementwise XLA 5-stream ceiling: ~720 GB/s (0.88 of nominal).
* EVERY Pallas variant — elementwise or stencil, blocks 256..2048,
  packed operands, transposed layout, rolls vs concats, fused scale —
  pipelines at ~490-503 GB/s (~0.61 of nominal, ~0.69 of the XLA
  ceiling).  The limit is the Pallas DMA pipeline on this chip, NOT the
  stencil shifts (a no-shift Pallas elementwise kernel measures the
  same).  b2048+/b4096 hit remote-compile INTERNAL errors.
* XLA-fused jnp stencils are worse (concat 316, pad 389, roll 268).
* bf16-stored diagonals (f32 state/compute) move 14 B/cell instead of
  20: 0.99 ms vs 1.34 ms -> 1.01e11 nnz/s = 0.83 of the f32-format
  roofline at b1024.  Adopted as the production Jacobian-action format
  for f32 runs (ops/pallas_kernels.tridiag_spmv_mixed).
"""
import time
import json
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 100
NCOL, NZ = 131072, 256
ROOF = 819.0  # v5e GB/s


def timeit(fn, *args):
    out = fn(*args)
    _ = float(out)  # warm/compile
    lat_fn = jax.jit(lambda v: v + 1.0)
    _ = float(lat_fn(jnp.zeros(())))
    t0 = time.perf_counter()
    _ = float(lat_fn(jnp.zeros(())))
    latency = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = float(fn(*args))
    total = time.perf_counter() - t0
    return max(total - latency, 1e-9) / ITERS


def chained(spmv):
    @jax.jit
    def f(dl, d, du, x):
        def body(_, xc):
            return spmv(dl, d, du, xc) * 0.5
        return jax.lax.fori_loop(0, ITERS, body, x).sum()
    return f


def jnp_concat(dl, d, du, x):
    z = jnp.zeros_like(x[:, :1])
    lo = jnp.concatenate([z, dl[:, 1:] * x[:, :-1]], 1)
    hi = jnp.concatenate([du[:, :-1] * x[:, 1:], z], 1)
    return d * x + lo + hi


def jnp_pad(dl, d, du, x):
    xl = jnp.pad(x, ((0, 0), (1, 0)))[:, :-1]
    xr = jnp.pad(x, ((0, 0), (0, 1)))[:, 1:]
    return d * x + dl * xl + du * xr


def pallas_kernel(block_cols, roll=False):
    def kern(dl_ref, d_ref, du_ref, x_ref, y_ref):
        xx = x_ref[:]
        if roll:
            xl = pltpu.roll(xx, 1, 1)
            xr = pltpu.roll(xx, -1, 1)
            nz = xx.shape[1]
            col = jax.lax.broadcasted_iota(jnp.int32, xx.shape, 1)
            xl = jnp.where(col == 0, 0.0, xl)
            xr = jnp.where(col == nz - 1, 0.0, xr)
            y_ref[:] = d_ref[:] * xx + dl_ref[:] * xl + du_ref[:] * xr
        else:
            z = jnp.zeros_like(xx[:, :1])
            lo = jnp.concatenate([z, dl_ref[:, 1:] * xx[:, :-1]], 1)
            hi = jnp.concatenate([du_ref[:, :-1] * xx[:, 1:], z], 1)
            y_ref[:] = d_ref[:] * xx + lo + hi

    def spmv(dl, d, du, x):
        ncol, nz = x.shape
        bs = lambda: pl.BlockSpec((block_cols, nz), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((ncol, nz), x.dtype),
            grid=(ncol // block_cols,),
            in_specs=[bs(), bs(), bs(), bs()],
            out_specs=bs(),
        )(dl, d, du, x)
    return spmv


def bf16_variant(block_cols):
    # diagonals stored bf16, x/y f32; compute f32
    def kern(dl_ref, d_ref, du_ref, x_ref, y_ref):
        xx = x_ref[:]
        d = d_ref[:].astype(jnp.float32)
        dl = dl_ref[:].astype(jnp.float32)
        du = du_ref[:].astype(jnp.float32)
        z = jnp.zeros_like(xx[:, :1])
        lo = jnp.concatenate([z, dl[:, 1:] * xx[:, :-1]], 1)
        hi = jnp.concatenate([du[:, :-1] * xx[:, 1:], z], 1)
        y_ref[:] = d * xx + lo + hi

    def spmv(dl, d, du, x):
        ncol, nz = x.shape
        bsf = lambda: pl.BlockSpec((block_cols, nz), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((ncol, nz), x.dtype),
            grid=(ncol // block_cols,),
            in_specs=[bsf(), bsf(), bsf(), bsf()],
            out_specs=bsf(),
        )(dl.astype(jnp.bfloat16), d.astype(jnp.bfloat16),
          du.astype(jnp.bfloat16), x)
    return spmv




def pallas_kernel_cp(block_cols, semantics="arbitrary"):
    def kern(dl_ref, d_ref, du_ref, x_ref, y_ref):
        xx = x_ref[:]
        z = jnp.zeros_like(xx[:, :1])
        lo = jnp.concatenate([z, dl_ref[:, 1:] * xx[:, :-1]], 1)
        hi = jnp.concatenate([du_ref[:, :-1] * xx[:, 1:], z], 1)
        y_ref[:] = d_ref[:] * xx + lo + hi

    def spmv(dl, d, du, x):
        ncol, nz = x.shape
        bs = lambda: pl.BlockSpec((block_cols, nz), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((ncol, nz), x.dtype),
            grid=(ncol // block_cols,),
            in_specs=[bs(), bs(), bs(), bs()],
            out_specs=bs(),
            compiler_params=pltpu.TPUCompilerParams(
                dimension_semantics=(semantics,)),
        )(dl, d, du, x)
    return spmv


def packed_kernel(block_cols):
    """Diagonals packed into one [ncol, 3*nz] array: 3 HBM streams."""
    def kern(t_ref, x_ref, y_ref):
        nz = x_ref.shape[1]
        xx = x_ref[:]
        dl = t_ref[:, :nz]
        d = t_ref[:, nz:2 * nz]
        du = t_ref[:, 2 * nz:]
        z = jnp.zeros_like(xx[:, :1])
        lo = jnp.concatenate([z, dl[:, 1:] * xx[:, :-1]], 1)
        hi = jnp.concatenate([du[:, :-1] * xx[:, 1:], z], 1)
        y_ref[:] = d * xx + lo + hi

    def spmv(t, x):
        ncol, nz = x.shape
        bs3 = pl.BlockSpec((block_cols, 3 * nz), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
        bs1 = lambda: pl.BlockSpec((block_cols, nz), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((ncol, nz), x.dtype),
            grid=(ncol // block_cols,),
            in_specs=[bs3, bs1()],
            out_specs=bs1(),
        )(t, x)

    @jax.jit
    def f(dl, d, du, x):
        t = jnp.concatenate([dl, d, du], axis=1)

        def body(_, xc):
            return spmv(t, xc) * 0.5
        return jax.lax.fori_loop(0, ITERS, body, x).sum()
    return f


def main():
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    shape = (NCOL, NZ)
    d = jax.random.uniform(k1, shape, jnp.float32, 1.0, 2.0)
    dl = jax.random.uniform(k2, shape, jnp.float32, 0.1, 0.2)
    du = jax.random.uniform(k3, shape, jnp.float32, 0.1, 0.2)
    x = jax.random.uniform(k4, shape, jnp.float32, 0.0, 1.0)
    bytes_f32 = 5 * NCOL * NZ * 4

    results = {}

    # stream ceiling (pure elementwise, 4r1w)
    @jax.jit
    def ceiling(a, b, c, x):
        def body(_, xc):
            return jnp.minimum(a + xc * (b - xc * c), 2.0) * 0.9
        return jax.lax.fori_loop(0, ITERS, body, x).sum()
    dt = timeit(ceiling, dl, d, du, x)
    results["ceiling_elementwise"] = bytes_f32 / dt / 1e9

    import os
    fast = os.environ.get("EXP_FAST")
    variants = {
        "pallas_b512": chained(pallas_kernel(512)),
        "pallas_b1024": chained(pallas_kernel(1024)),
        "pallas_b2048": chained(pallas_kernel(2048)),
        "pallas_b4096": chained(pallas_kernel(4096)),
        "pallas_roll_b1024": chained(pallas_kernel(1024, roll=True)),
        "jnp_concat": chained(jnp_concat),
        "jnp_pad": chained(jnp_pad),
        "pallas_bf16diag_b1024": chained(bf16_variant(1024)),
        "pallas_b128": chained(pallas_kernel(128)),
        "pallas_b256": chained(pallas_kernel(256)),
        "pallas_b256_arb": chained(pallas_kernel_cp(256, "arbitrary")),
        "pallas_b512_par": chained(pallas_kernel_cp(512, "parallel")),
        "pallas_packed_b512": packed_kernel(512),
        "pallas_packed_b1024": packed_kernel(1024),
    }
    if fast:
        keep = ("pallas_b1024", "pallas_b256", "pallas_packed_b1024",
                "pallas_b2048")
        variants = {k: v for k, v in variants.items() if k in keep}
    for name, fn in variants.items():
        try:
            dt = timeit(fn, dl, d, du, x)
            gbs = bytes_f32 / dt / 1e9
            if "bf16" in name:
                actual = (3 * 2 + 2 * 4) * NCOL * NZ
                results[name] = {"equiv_f32_GB_s": gbs,
                                 "actual_GB_s": actual / dt / 1e9,
                                 "ms": dt * 1e3}
            else:
                results[name] = {"GB_s": gbs, "frac_roof": gbs / ROOF,
                                 "ms": dt * 1e3}
        except Exception as e:  # noqa
            results[name] = f"FAIL: {type(e).__name__}: {e}"[:200]
        print(name, "->", results[name], flush=True)

    print(json.dumps(results, indent=1, default=str))


if __name__ == "__main__":
    main()
