"""Correctness of the Pallas kernel layer (jnp fallback path on CPU; the
same code paths compile to Pallas on TPU, exercised by bench.py)."""
import numpy as np
import jax.numpy as jnp

from mpp_tpu.ops.pallas_kernels import (tridiag_spmv, tridiag_spmv_chain,
                                        tridiag_jacobi_smooth)
from mpp_tpu.ops.tridiag import tridiag_matvec, thomas


def _system(ncol=16, nz=32, seed=0):
    rng = np.random.default_rng(seed)
    d = jnp.asarray(rng.uniform(4.0, 5.0, (ncol, nz)))
    dl = jnp.asarray(rng.uniform(0.1, 0.9, (ncol, nz)))
    du = jnp.asarray(rng.uniform(0.1, 0.9, (ncol, nz)))
    x = jnp.asarray(rng.uniform(-1.0, 1.0, (ncol, nz)))
    return dl, d, du, x


def test_spmv_matches_matvec():
    dl, d, du, x = _system()
    np.testing.assert_allclose(np.asarray(tridiag_spmv(dl, d, du, x)),
                               np.asarray(tridiag_matvec(dl, d, du, x)),
                               rtol=1e-14)


def test_spmv_chain_matches_repeated_application():
    dl, d, du, x = _system()
    got = tridiag_spmv_chain(dl, d, du, x, iters=4, scale=0.25)
    want = x
    for _ in range(4):
        want = tridiag_matvec(dl, d, du, want) * 0.25
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-13)


def test_jacobi_smoother_converges_to_thomas_solution():
    dl, d, du, _ = _system()
    rng = np.random.default_rng(7)
    b = jnp.asarray(rng.uniform(-1.0, 1.0, dl.shape))
    x_exact = thomas(dl, d, du, b)
    x = tridiag_jacobi_smooth(dl, d, du, b, jnp.zeros_like(b), iters=200,
                              omega=0.9)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_exact),
                               rtol=1e-8, atol=1e-10)
