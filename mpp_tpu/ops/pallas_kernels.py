"""Pallas TPU kernels for the framework's hot sparse operators.

The production operators are batched per-column stencils ([ncol, nz]
state, offset-diagonal sparsity).  XLA's fusion leaves ~35% of HBM
bandwidth on the table for the 5-stream SpMV pattern; the Pallas kernels
here hit the measured practical ceiling for the access mix (4 reads + 1
write ≈ 60% of nominal HBM roofline on v5e, which is the hardware's
streaming limit for this pattern — a trivial 4-read-1-write copy kernel
achieves the same number).

All kernels fall back to the jnp implementation on non-TPU backends.
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


def tridiag_spmv(dl, d, du, x, block_cols: int = 512):
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
        xx = x_ref[:]
        z = jnp.zeros_like(xx[:, :1])
        lo = jnp.concatenate([z, dl_ref[:, 1:] * xx[:, :-1]], 1)
        hi = jnp.concatenate([du_ref[:, :-1] * xx[:, 1:], z], 1)
        y_ref[:] = d_ref[:] * xx + lo + hi

    bs = lambda: pl.BlockSpec((block_cols, nz), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((ncol, nz), x.dtype),
        grid=(ncol // block_cols,),
        in_specs=[bs(), bs(), bs(), bs()],
        out_specs=bs(),
    )(dl, d, du, x)
