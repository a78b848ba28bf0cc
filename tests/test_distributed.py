"""Multi-host backend helpers (single-host behavior + bounds math)."""
import jax
import numpy as np

from mpp_tpu.parallel.distributed import (global_column_mesh,
                                          initialize_distributed,
                                          process_local_slice)


def test_initialize_noop_single_host(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert initialize_distributed() is False


def test_global_mesh_covers_all_devices():
    mesh = global_column_mesh()
    assert mesh.devices.size == len(jax.devices())
    assert mesh.axis_names == ("col",)


def test_process_local_slice_partition():
    n, parts = 103, 8
    spans = [process_local_slice(n, parts, i) for i in range(parts)]
    # contiguous, covering, balanced within 1
    assert spans[0][0] == 0 and spans[-1][1] == n
    for (a, b), (c, d) in zip(spans, spans[1:]):
        assert b == c
    sizes = [b - a for a, b in spans]
    assert max(sizes) - min(sizes) <= 1


def test_sharded_step_on_global_mesh():
    """The ALM lateral solve runs on the global mesh object."""
    import jax.numpy as jnp
    from mpp_tpu.driver import alm
    from mpp_tpu.parallel.sharding import shard_columns
    mesh = global_column_mesh()
    ncol = 2 * mesh.devices.size
    shape = (ncol, 6)
    prob = alm.alm_vsfm_initialize(
        watsat=np.full(shape, 0.368), hksat=np.full(shape, 0.0070556),
        bsw=np.full(shape, 2.0), sucsat=np.full(shape, 29.772),
        residual_sat=np.full(shape, 0.2772), dz=np.full(shape, 0.1),
        area=np.ones(ncol), P0=np.full(shape, 3.5355e3),
        lateral_connectivity=True, lateral_conductance=1e-10,
        device_mesh=mesh)
    out = alm.alm_vsfm_solve(prob, 600.0)
    assert np.isfinite(np.asarray(prob.P)).all()
