"""Unstructured distributed grid (ugrid/ugdm analog): general-graph halo
exchange, orderings, and the sharded hillslope VSFM step on the 8-device
CPU mesh (VERDICT r1 item 3; UnstructuredGridType.F90:22-66,481-670,
MPPVSFMALM_Initialize.F90:588-795)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding
from jax import shard_map

from mpp_tpu.parallel.ugrid import UGrid

NDEV = 8


def _mesh():
    devs = jax.devices()
    if len(devs) < NDEV:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.array(devs[:NDEV]), ("col",))


def test_halo_exchange_arbitrary_graph():
    rng = np.random.default_rng(0)
    ug = UGrid.regular_2d(6, 4)           # 24 columns, 2-D adjacency
    dm = ug.partition(NDEV)
    mesh = _mesh()

    x_nat = rng.uniform(size=(ug.ncol, 3))
    x_sh = jnp.asarray(dm.natural_to_sharded(x_nat))

    def f(x_own):
        return dm.halo_exchange(x_own, "col")

    ext = shard_map(f, mesh=mesh, in_specs=(P("col", None),),
                    out_specs=P("col", None))(x_sh)
    ext = np.asarray(ext).reshape(NDEV, dm.n_own + dm.n_ghost, 3)

    og = np.asarray(dm.own_global_nat)
    gsrc = np.asarray(dm.ghost_src)
    eidx = np.asarray(dm.export_idx)
    # rebuild the expected ghost values from the maps
    exp_nat = og[np.arange(NDEV)[:, None], eidx]  # natural id exported
    flat = exp_nat.reshape(-1)
    for d in range(NDEV):
        own = og[d]
        np.testing.assert_array_equal(ext[d, :dm.n_own][own >= 0],
                                      x_nat[own[own >= 0]])
        ghost_nat = flat[gsrc[d]]
        np.testing.assert_array_equal(ext[d, dm.n_own:],
                                      x_nat[ghost_nat])


def test_orderings_roundtrip_with_permutation():
    rng = np.random.default_rng(1)
    ug = UGrid.regular_2d(5, 5)
    perm = rng.permutation(25)
    dm = ug.partition(4, petsc_order=perm)
    x = rng.uniform(size=(25, 2))
    np.testing.assert_array_equal(dm.sharded_to_natural(
        dm.natural_to_sharded(x)), x)
    n2p = np.asarray(dm.nat2petsc)
    p2n = np.asarray(dm.petsc2nat)
    np.testing.assert_array_equal(p2n[n2p], np.arange(25))


def test_lateral_source_matches_serial():
    rng = np.random.default_rng(2)
    ug = UGrid.regular_2d(8, 4, dx=2.0, dy=1.0)
    dm = ug.partition(NDEV)
    mesh = _mesh()
    cond = 1.3e-3

    x_nat = rng.uniform(0.0, 1.0, ug.ncol)
    # serial reference: sum over undirected edges
    src_nat = np.zeros(ug.ncol)
    for (a, b), w in zip(ug.edges, ug.edge_weight):
        f = -cond * w * (x_nat[a] - x_nat[b])
        src_nat[a] += f
        src_nat[b] -= f

    x_sh = jnp.asarray(dm.natural_to_sharded(x_nat))

    def f(x_own):
        return dm.lateral_source(x_own, cond, "col")

    src_sh = shard_map(f, mesh=mesh, in_specs=(P("col"),),
                       out_specs=P("col"))(x_sh)
    got = dm.sharded_to_natural(np.asarray(src_sh))
    np.testing.assert_allclose(got, src_nat, rtol=1e-12, atol=1e-15)
    # conservation: lateral exchange sums to zero
    assert abs(np.asarray(src_sh).sum()) < 1e-12


def test_hillslope_vsfm_sharded_matches_single_device():
    """2-D lateral adjacency + batched implicit vertical solve: the
    sharded (8-device) step must match the identical single-device run
    (SURVEY §7.2 step 8 self-consistency)."""
    from mpp_tpu.models import vsfm_batched as vb

    nx, ny, nz = 8, 4, 8
    ug = UGrid.regular_2d(nx, ny)
    dm = ug.partition(NDEV)
    mesh = _mesh()
    dtype = jnp.float64
    params = vb.ColumnParams.uniform(nz, dtype=dtype)
    cond = jnp.asarray(1.0e-11, dtype)

    # elevation-driven initial pressures (hillslope): wetter downslope
    xg, yg = np.meshgrid(np.arange(nx), np.arange(ny))
    elev = (xg + 0.5 * yg).reshape(-1)
    P_nat = (3.5355e3 + 1.5e4 * (elev / elev.max())).astype(np.float64)
    P_nat = np.broadcast_to(P_nat[:, None], (ug.ncol, nz)).copy()
    bc_top = np.full(ug.ncol, 9.3991e4)
    bc_bot = np.full(ug.ncol, 3.5355e3)

    # single-device reference (same maps on a 1-device partition)
    dm1 = ug.partition(1)
    mesh1 = Mesh(np.array(jax.devices()[:1]), ("col",))

    def step(dmx, meshx, Pl, bt, bb):
        def f(Pc, bt_, bb_):
            src = dmx.lateral_source(Pc[..., 0] * 0.0 + Pc.mean(-1), cond,
                                     "col")
            # lateral flux driven by column-mean pressure, fed as a
            # uniform source over levels (op-split staging)
            ss = jnp.broadcast_to(src[:, None] / nz, Pc.shape)
            Pn, _, _ = vb.step_dt(Pc, 3600.0, bt_, bb_, params, ss=ss)
            return Pn
        sh = shard_map(f, mesh=meshx,
                       in_specs=(P("col", None), P("col"), P("col")),
                       out_specs=P("col", None))
        return sh(Pl, bt, bb)

    P1 = step(dm1, mesh1, jnp.asarray(dm1.natural_to_sharded(P_nat)),
              jnp.asarray(dm1.natural_to_sharded(bc_top)),
              jnp.asarray(dm1.natural_to_sharded(bc_bot)))
    P8 = step(dm, mesh, jnp.asarray(dm.natural_to_sharded(P_nat)),
              jnp.asarray(dm.natural_to_sharded(bc_top)),
              jnp.asarray(dm.natural_to_sharded(bc_bot)))

    P1n = dm1.sharded_to_natural(np.asarray(P1))
    P8n = dm.sharded_to_natural(np.asarray(P8))
    np.testing.assert_allclose(P8n, P1n, rtol=1e-12, atol=1e-8)

    # and the lateral physics actually did something
    P_off, _, _ = vb.step_dt(jnp.asarray(P_nat), 3600.0,
                             jnp.asarray(bc_top), jnp.asarray(bc_bot),
                             params)
    assert np.max(np.abs(P1n - np.asarray(P_off))) > 1.0
