"""Entry-for-entry parity: batched block-tridiagonal MLC assembly + exact
block-Thomas solve vs the serial CSR assembly + GMRES+ILU(0) golden path
(models/mlc.py, itself verified against the mlc suite goldens)."""
import copy

import numpy as np
import pytest

from mpp_tpu.batched import mlc as bmlc
from mpp_tpu.problems.mlc import run_mlc_problem

DT = 5.0 * 60.0


def _staged_mpp(ncair, ntree):
    """An MLC problem advanced one step, then re-staged for the next step
    (exactly what step_dt does before assembling)."""
    mpp = run_mlc_problem(ncair=ncair, ntree=ntree)
    mpp.dtime = DT
    mpp._vol_air = mpp._compute_vol_air()
    mpp.pre_solve()
    return mpp


def _block_to_global(mpp):
    """Permutation: block coordinate (icair, k, row) -> serial index."""
    nc, nlev, nt = mpp.ncair, mpp.nlev, mpp.ntree
    ns = 2 * nt
    m = 2 + ns
    o = mpp.off
    g = np.zeros((nc, nlev, m), np.int64)
    for ic in range(nc):
        for k in range(nlev):
            g[ic, k, 0] = o[0] + ic * nlev + k
            g[ic, k, 1] = o[1] + ic * nlev + k
            for s in range(ns):
                r, it = divmod(s, nt)
                g[ic, k, 2 + s] = o[2 + r] + (ic * nt + it) * nlev + k
    return g


@pytest.mark.parametrize("ncair,ntree", [(1, 1), (2, 2)])
def test_block_assembly_matches_serial_csr(ncair, ntree):
    mpp = _staged_mpp(ncair, ntree)
    rows, cols, vals = mpp.compute_operators()
    b_serial = mpp.compute_rhs()
    A_serial = np.zeros((mpp.n, mpp.n))
    np.add.at(A_serial, (rows, cols), vals)

    inp = bmlc.inputs_from_mpp(mpp)
    L, D, U, b = (np.asarray(a) for a in bmlc.assemble(inp, DT))

    g = _block_to_global(mpp)
    nc, nlev, m = g.shape
    A_block = np.zeros_like(A_serial)
    bb = np.zeros(mpp.n)
    for ic in range(nc):
        for k in range(nlev):
            gi = g[ic, k]
            A_block[np.ix_(gi, gi)] += D[ic, k]
            if k > 0:
                A_block[np.ix_(gi, g[ic, k - 1])] += L[ic, k]
            if k < nlev - 1:
                A_block[np.ix_(gi, g[ic, k + 1])] += U[ic, k]
            bb[gi] = b[ic, k]

    np.testing.assert_allclose(A_block, A_serial, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(bb, b_serial, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("ncair,ntree", [(1, 1), (2, 2)])
def test_block_thomas_solution_matches_serial(ncair, ntree):
    mpp = _staged_mpp(ncair, ntree)
    inp = bmlc.inputs_from_mpp(mpp)
    x_blk = np.asarray(bmlc.step(inp, DT))

    # exact dense solve of the serial system
    rows, cols, vals = mpp.compute_operators()
    b_serial = mpp.compute_rhs()
    A = np.zeros((mpp.n, mpp.n))
    np.add.at(A, (rows, cols), vals)
    x_exact = np.linalg.solve(A, b_serial)

    g = _block_to_global(mpp)
    x_flat = np.zeros(mpp.n)
    x_flat[g.reshape(-1)] = x_blk.reshape(-1)
    np.testing.assert_allclose(x_flat, x_exact, rtol=1e-9, atol=1e-11)

    # and against the production serial step — GMRES+ILU stops at PETSc's
    # relative tolerance, a few 1e-3 K short of the exact solution the
    # block-Thomas sweep lands on (the dense comparison above is the
    # authoritative one)
    mpp2 = copy.deepcopy(mpp)
    mpp2.step_dt(DT)
    np.testing.assert_allclose(x_flat, mpp2.soln, rtol=1e-5, atol=5e-3)


def test_batched_mlc_jits():
    import jax
    mpp = _staged_mpp(1, 1)
    inp = bmlc.inputs_from_mpp(mpp)
    fn = jax.jit(lambda i: bmlc.step(i, DT))
    x = np.asarray(fn(inp))
    assert np.isfinite(x).all()
    # physical sanity: canopy air temperature near the forcing (~296 K)
    assert 280.0 < x[:, 1:, 0].mean() < 310.0


def test_compiled_mlc_matches_serial_step():
    """CompiledMLC (vectorized segment assembly + batched GMRES+ILU)
    reproduces the serial per-cell assembly + host Krylov step on the
    same staged problem to f64 round-off (reference-tree independent)."""
    import numpy as np
    from mpp_tpu.problems.mlc import run_mlc_problem

    x_serial = np.asarray(run_mlc_problem(ncair=2, ntree=2).soln)
    x_comp = np.asarray(run_mlc_problem(ncair=2, ntree=2,
                                        use_compiled=True).soln)
    np.testing.assert_allclose(x_comp, x_serial, rtol=0, atol=1e-10)
