"""1-shard vs N-shard self-consistency (SURVEY §7.2 step 8, VERDICT r1
item 10): the sharded lateral VSFM step must produce the same answer on
1 device and on the full 8-device CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mpp_tpu.driver import alm
from mpp_tpu.parallel.sharding import column_mesh, shard_columns


def _solve_on(ndev, ncol, nz=8):
    mesh = column_mesh(ndev)
    shape = (ncol, nz)
    prob = alm.alm_vsfm_initialize(
        watsat=np.full(shape, 0.368),
        hksat=np.full(shape, 0.0070556),
        bsw=np.full(shape, 2.0),
        sucsat=np.full(shape, 29.772),
        residual_sat=np.full(shape, 0.2772),
        dz=np.full(shape, 0.1), area=np.ones(ncol),
        P0=np.full(shape, 3.5355e3),
        lateral_connectivity=True, lateral_conductance=1e-10,
        device_mesh=mesh)
    P0 = np.full((ncol, nz), 3.5355e3)
    P0[: ncol // 2] = 9.0e4
    prob.P = shard_columns(jnp.asarray(P0), mesh)
    out = alm.alm_vsfm_solve(prob, 600.0)
    return np.asarray(prob.P), np.asarray(out["qflx_lateral"])


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 CPU devices")
def test_one_vs_eight_shards():
    ncol = 16
    P1, q1 = _solve_on(1, ncol)
    P8, q8 = _solve_on(8, ncol)
    # same physics regardless of sharding; f64 CPU reduction order can
    # differ across shardings, so allow tiny roundoff
    np.testing.assert_allclose(P8, P1, rtol=0, atol=1e-6)
    np.testing.assert_allclose(q8, q1, rtol=0, atol=1e-12)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 CPU devices")
def test_two_vs_four_shards():
    ncol = 8
    P2, _ = _solve_on(2, ncol)
    P4, _ = _solve_on(4, ncol)
    np.testing.assert_allclose(P4, P2, rtol=0, atol=1e-6)
