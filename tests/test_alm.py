"""ELM/ALM coupling-layer analog (driver/alm.py vs MPPVSFMALM_Driver.F90).

Covers: CLM-unit flux staging (infiltration source, root-weighted ET
sinks), the retry ladder (stol_alternate on divergence, rtol/stol
tightening on mass-balance-audit failure), the per-column mass-balance
audit at max_abs_mass_error_col=1e-5 kg, CLM-facing unpacking
(h2osoi_liq, smp_l in mm, zwt water-table interpolation), and the lateral
ghost-exchange path on the virtual 8-device CPU mesh.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpp_tpu.driver import alm
from mpp_tpu.constants import DENH2O


def _make_problem(ncol=6, nz=15, **kw):
    shape = (ncol, nz)
    kw.setdefault("P0", np.full(shape, 3.5355e3))
    return alm.alm_vsfm_initialize(
        watsat=np.full(shape, 0.368),
        hksat=np.full(shape, 0.0070556),      # mm/s (CLM-ish)
        bsw=np.full(shape, 2.0),              # lambda = 0.5
        sucsat=np.full(shape, 29.772),        # 1/(alpha*g), m of water
        residual_sat=np.full(shape, 0.2772),
        dz=np.full(shape, 0.1), area=np.ones(ncol), **kw)


def test_mass_balance_closed_no_flux():
    """No fluxes, closed column: audit passes on the first attempt."""
    prob = _make_problem()
    out = alm.alm_vsfm_solve(prob, 1800.0)
    assert out["attempts"] == 1
    assert out["abs_mass_error_col"] < alm.MAX_ABS_MASS_ERROR_COL
    assert out["diverged_count"] == 0 and out["mass_bal_err_count"] == 0


def test_infiltration_increases_storage_and_balances():
    prob = _make_problem()
    m0 = np.asarray(alm._cell_mass_kg(prob.P, prob.params).sum(axis=1))
    qinfl = np.full(prob.ncol, 5e-4)          # mm/s
    out = alm.alm_vsfm_solve(prob, 1800.0, qflx_infl=qinfl)
    m1 = np.asarray(alm._cell_mass_kg(prob.P, prob.params).sum(axis=1))
    added = m1 - m0
    # expected: qinfl * area * denh2o * 1e-3 * dt kg, minus boundary
    # leakage (bc defaults at prior state drain a little)
    expect = qinfl * 1.0 * DENH2O * 1e-3 * 1800.0
    assert np.all(added > 0.2 * expect)
    assert out["abs_mass_error_col"] < alm.MAX_ABS_MASS_ERROR_COL
    # infiltration wets the top cell most
    sat, _, _, _ = __import__("mpp_tpu.models.vsfm_batched",
                              fromlist=["vg_sat_kr"]).vg_sat_kr(
        prob.P, prob.params)
    sat = np.asarray(sat)
    assert np.all(sat[:, -1] >= sat[:, 0])


def test_et_sink_dries_root_zone():
    prob = _make_problem()
    # wet start
    prob.P = jnp.full((prob.ncol, prob.nz), 9.0e4, prob.P.dtype)
    rootr = np.zeros((prob.ncol, prob.nz))
    rootr[:, -5:] = 0.2                       # roots in the top 5 layers
    m0 = np.asarray(alm._cell_mass_kg(prob.P, prob.params).sum(axis=1))
    out = alm.alm_vsfm_solve(prob, 1800.0,
                             qflx_tran_veg=np.full(prob.ncol, 2e-4),
                             rootr=rootr)
    m1 = np.asarray(alm._cell_mass_kg(prob.P, prob.params).sum(axis=1))
    assert np.all(m1 < m0)
    assert out["abs_mass_error_col"] < alm.MAX_ABS_MASS_ERROR_COL


def test_clm_unpacking_units():
    prob = _make_problem()
    out = alm.alm_vsfm_solve(prob, 600.0)
    h2o = np.asarray(out["h2osoi_liq"])       # kg/m^2 per layer
    assert h2o.shape == (prob.ncol, prob.nz)
    # layer water content bounded by porosity*dz*denh2o
    assert np.all(h2o > 0) and np.all(h2o <= 0.368 * 0.1 * DENH2O + 1e-9)
    # unsaturated start: matrix potential negative, in mm
    smp = np.asarray(out["smp_l"])
    assert np.all(smp < 0) and np.all(smp > -1e6)
    zwt = out["zwt"]
    assert np.all(zwt >= 0) and np.all(zwt <= prob.nz * 0.1 + 1e-12)
    assert np.all(np.asarray(out["qcharge"]) == 0.0)


def test_water_table_detection():
    """Bottom-saturated column: zwt interpolates inside the column."""
    prob = _make_problem(ncol=2, nz=10)
    Pcol = np.linspace(1.5e5, 0.2e5, 10)      # saturated bottom, dry top
    prob.P = jnp.asarray(np.tile(Pcol, (2, 1)))
    smp_l = np.asarray((prob.P - 101325.0) / (DENH2O * 9.80616) * 1000.0)
    zwt = alm._water_table_depth(smp_l, prob.zi)
    assert np.all(zwt > 0.0) and np.all(zwt < 1.0)


def test_retry_ladder_tightens_on_audit_failure(monkeypatch):
    """Force the audit to fail once: the driver tightens tolerances and
    re-solves (mass_bal_err_count=1, attempts=2), as Driver.F90:886-905."""
    prob = _make_problem()
    calls = {"n": 0}
    real = alm._bc_flux_kg

    def fake(P, bc_top, bc_bot, p):
        calls["n"] += 1
        if calls["n"] == 1:
            return real(P, bc_top, bc_bot, p) + 1.0   # 1 kg/s phantom error
        return real(P, bc_top, bc_bot, p)

    monkeypatch.setattr(alm, "_bc_flux_kg", fake)
    out = alm.alm_vsfm_solve(prob, 600.0)
    assert out["mass_bal_err_count"] == 1
    assert out["attempts"] == 2
    assert out["abs_mass_error_col"] < alm.MAX_ABS_MASS_ERROR_COL


def test_retry_ladder_aborts_after_max_attempts(monkeypatch):
    prob = _make_problem()
    monkeypatch.setattr(alm, "_bc_flux_kg",
                        lambda P, bt, bb, p: jnp.full((prob.ncol,), 1.0))
    with pytest.raises(RuntimeError, match="failed to converge"):
        alm.alm_vsfm_solve(prob, 600.0)


def test_lateral_ghost_exchange_sharded():
    """Lateral path on the 8-device CPU mesh: wet and dry column groups
    relax toward each other through ppermute halos; mass is conserved."""
    ndev = len(jax.devices())
    from mpp_tpu.parallel.sharding import column_mesh, shard_columns
    mesh = column_mesh(ndev)
    ncol = 2 * ndev
    prob = _make_problem(ncol=ncol, nz=8, lateral_connectivity=True,
                         lateral_conductance=1e-10, device_mesh=mesh)
    P0 = np.full((ncol, 8), 3.5355e3)
    P0[: ncol // 2] = 9.0e4                   # left half wet
    prob.P = shard_columns(jnp.asarray(P0), mesh)
    m0 = float(alm._cell_mass_kg(prob.P, prob.params).sum())
    out = alm.alm_vsfm_solve(prob, 600.0)
    m1 = float(alm._cell_mass_kg(prob.P, prob.params).sum())
    qlat = np.asarray(out["qflx_lateral"])
    # wet columns lose to neighbors at the wet/dry interface
    assert qlat[ncol // 2 - 1] > 0 and qlat[ncol // 2] < 0
    # interior columns see zero net lateral flux
    assert abs(qlat[0]) < 1e-12
    # op-split lateral source conserves mass globally (pair-antisymmetric)
    assert abs(float(np.sum(qlat))) < 1e-10
    assert out["abs_mass_error_col"] < alm.MAX_ABS_MASS_ERROR_COL
    assert m1 == pytest.approx(m0, rel=1e-6)


def test_lateral_ugdm_darcy_sharded():
    """ALM lateral connectivity through the general-graph UGDM with the
    physical per-level lateral Darcy flux (VERDICT r2 item 6: replaces
    the 1-D ring + scalar conductance), sharded on the 8-device mesh,
    cross-checked against the serial global evaluation."""
    from jax.sharding import Mesh
    from mpp_tpu.parallel.ugrid import UGrid, lateral_darcy_source_global
    from mpp_tpu.models import vsfm_batched as vb

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = Mesh(np.array(devs[:8]), ("col",))

    nx, ny, nz = 4, 4, 12
    ug = UGrid.regular_2d(nx, ny)
    ug.edge_dist[:] = 10.0
    ug.edge_area[:] = 10.0
    ncol = ug.ncol
    # wet/dry contrast drives lateral redistribution
    P0 = np.full((ncol, nz), 3.5355e3)
    P0[: ncol // 2] = 1.06e5
    prob = _make_problem(ncol=ncol, nz=nz, lateral_connectivity=True,
                         device_mesh=mesh, ugrid=ug, P0=P0)
    assert prob.ugdm is not None

    out = alm.alm_vsfm_solve(prob, 1800.0)
    qlat = np.asarray(out["qflx_lateral"])
    # pair-antisymmetric op-split fluxes conserve mass globally
    assert abs(qlat.sum()) < 1e-10 * np.abs(qlat).max()
    # wet columns lose, dry columns gain
    assert qlat[: ncol // 2].sum() > 0.0      # positive = outflow (mm/s)
    assert qlat[ncol // 2:].sum() < 0.0

    # sharded lateral source == serial global evaluation
    P = jnp.asarray(P0, prob.P.dtype)
    src_sharded = np.asarray(alm._lateral_source(prob, P))
    _, _, kr, _ = vb.vg_sat_kr(P, prob.params)
    perm = jnp.broadcast_to(prob.params.perm, P.shape)
    dz = jnp.broadcast_to(prob.params.dz, P.shape)
    src_serial = np.asarray(lateral_darcy_source_global(
        ug, P, kr, perm, dz))
    np.testing.assert_allclose(src_sharded, src_serial, rtol=1e-12,
                               atol=1e-20)
