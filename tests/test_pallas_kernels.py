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


def test_tridiag_spmv_mixed_matches_f32():
    """Mixed-precision Jacobian action (bf16-stored diagonals): equals
    the f32 stencil within bf16 entry rounding; jit/vmap-safe."""
    import jax
    import jax.numpy as jnp
    from mpp_tpu.ops.pallas_kernels import tridiag_spmv_mixed
    from mpp_tpu.ops.tridiag import tridiag_matvec

    rng = np.random.default_rng(3)
    ncol, nz = 16, 32
    dl, d, du, x = (jnp.asarray(rng.uniform(0.5, 2.0, (ncol, nz)),
                                jnp.float32) for _ in range(4))
    y32 = tridiag_matvec(dl, d, du, x)
    y16 = tridiag_spmv_mixed(dl.astype(jnp.bfloat16),
                             d.astype(jnp.bfloat16),
                             du.astype(jnp.bfloat16), x)
    assert y16.dtype == jnp.float32
    # bf16 has ~3 decimal digits on the matrix entries
    np.testing.assert_allclose(np.asarray(y16), np.asarray(y32),
                               rtol=2e-2, atol=1e-3)
    y16j = jax.jit(tridiag_spmv_mixed)(dl.astype(jnp.bfloat16),
                                       d.astype(jnp.bfloat16),
                                       du.astype(jnp.bfloat16), x)
    np.testing.assert_allclose(np.asarray(y16j), np.asarray(y16),
                               rtol=1e-5, atol=1e-5)


def test_f32_newton_with_mixed_action_converges():
    """The compiled f32 Newton (whose BT initslope now runs the mixed
    bf16-diagonal action) converges identically well."""
    import jax.numpy as jnp
    import __graft_entry__ as g

    _, comp = g._build_compiled_celia(16)
    X = jnp.full((8, 16), 3.5355e3, jnp.float32)
    bc = jnp.tile(jnp.asarray([[9.3991e4, 3.5355e3]], jnp.float32), (8, 1))
    ss = jnp.zeros((8, 0), jnp.float32)
    src = jnp.zeros((8, 16), jnp.float32)
    Xn, iters, ok, reason = comp.step_batched(X, (bc,), (ss,), 3600.0,
                                              src=src)
    assert bool(ok.all()), np.asarray(reason)
    assert np.isfinite(np.asarray(Xn)).all()


def test_pallas_block_thomas2_interpret_matches_scan():
    """The Pallas 2x2 block-Thomas (TH Newton-direction solver) vs the
    lax.scan block sweep, in interpret mode (runs on CPU)."""
    from mpp_tpu.ops.pallas_kernels import pallas_block_thomas2
    from mpp_tpu.ops.block_thomas import block_thomas
    rng = np.random.default_rng(0)
    ncol, n = 256, 32
    L = (rng.standard_normal((ncol, n, 2, 2)) * 0.2).astype(np.float32)
    U = (rng.standard_normal((ncol, n, 2, 2)) * 0.2).astype(np.float32)
    D = rng.standard_normal((ncol, n, 2, 2)).astype(np.float32)
    D[..., 0, 0] += 3.0
    D[..., 1, 1] += 3.0
    b = rng.standard_normal((ncol, n, 2)).astype(np.float32)
    x = np.asarray(pallas_block_thomas2(
        jnp.asarray(L), jnp.asarray(D), jnp.asarray(U), jnp.asarray(b),
        interpret=True))
    xr = np.asarray(block_thomas(jnp.asarray(L), jnp.asarray(D),
                                 jnp.asarray(U), jnp.asarray(b)))
    np.testing.assert_allclose(x, xr, rtol=2e-5, atol=2e-5)
