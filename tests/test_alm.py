"""ELM/ALM coupling layer on the compiled full-physics path
(driver/alm.py vs MPPVSFMALM_Driver.F90 + MPPVSFMALM_Initialize.F90).

Covers: the facade-built ALM problem (reference condition list, CLM soil
staging with the default smooth_brooks_corey_bz3 + TGDPB01 density),
per-column heterogeneous soils through the compiled path's dyn contract
(batched solve bitwise-equal to independent single-column solves),
CLM-unit flux staging (infiltration/ET/dew/sublimation/drainage split),
the retry ladder, the per-column mass-balance audit at 1e-5 kg, the
f32->f64 per-column escalation, seepage BC, CLM-facing unpacking, and
the lateral ghost-exchange paths on the virtual 8-device CPU mesh.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpp_tpu.driver import alm
from mpp_tpu.constants import DENH2O


def _soil_kwargs(ncol=6, nz=15, dz=0.1):
    shape = (ncol, nz)
    return dict(
        watsat=np.full(shape, 0.368),
        hksat=np.full(shape, 0.0070556),      # mm/s (CLM-ish)
        bsw=np.full(shape, 2.0),              # lambda = 0.5
        sucsat=np.full(shape, 29.772),        # 1/(alpha*g), m of water
        residual_sat=np.full(shape, 0.2772),
        dz=np.full(shape, dz), area=np.ones(ncol))


def _make_problem(ncol=6, nz=15, **kw):
    soil = _soil_kwargs(ncol, nz)
    soil.update(kw)
    soil.setdefault("P0", np.full((ncol, nz), 3.5355e3))
    return alm.alm_vsfm_initialize(**soil)


def test_mass_balance_closed_no_flux():
    """No fluxes, closed column (reference default: no Dirichlet BCs,
    Initialize.F90:836-870): audit passes on the first attempt."""
    prob = _make_problem()
    out = alm.alm_vsfm_solve(prob, 1800.0)
    assert out["attempts"] == 1
    assert out["abs_mass_error_col"] < alm.MAX_ABS_MASS_ERROR_COL
    assert out["diverged_count"] == 0 and out["mass_bal_err_count"] == 0


def test_infiltration_adds_exact_mass():
    """Closed column: infiltration adds exactly qinfl*area*denh2o*1e-3*dt
    kg (the Driver:298 unit conversion), to audit tolerance."""
    prob = _make_problem()
    m0 = np.asarray(alm.cell_mass_kg(prob, prob.P)).sum(axis=1)
    qinfl = np.full(prob.ncol, 5e-4)          # mm/s
    out = alm.alm_vsfm_solve(prob, 1800.0, qflx_infl=qinfl)
    m1 = np.asarray(alm.cell_mass_kg(prob, prob.P)).sum(axis=1)
    expect = qinfl * 1.0 * DENH2O * 1e-3 * 1800.0
    np.testing.assert_allclose(m1 - m0, expect, atol=1e-8)
    assert out["abs_mass_error_col"] < alm.MAX_ABS_MASS_ERROR_COL
    # infiltration wets the top cell most
    sat = np.asarray(alm.cell_mass_kg(prob, prob.P))
    assert np.all(sat[:, -1] >= sat[:, 0])


def test_heterogeneous_soils_match_single_column_solves():
    """Per-column heterogeneous CLM soils through the dyn contract: the
    batched solve is identical to independent single-column problems
    (the reference's per-rank serial solves, SURVEY §2.8)."""
    ncol, nz = 3, 12
    rng = np.random.default_rng(0)
    watsat = 0.35 + 0.1 * rng.random((ncol, nz))
    hksat = 0.003 * (1 + rng.random((ncol, nz)))
    bsw = 2.0 + rng.random((ncol, nz))
    sucsat = 25.0 + 10 * rng.random((ncol, nz))
    res = 0.15 + 0.1 * rng.random((ncol, nz))
    dz = np.full((ncol, nz), 0.1)
    P0 = np.full((ncol, nz), 2.0e3)
    rootr = np.zeros((ncol, nz))
    rootr[:, -4:] = 0.25

    def make(cols):
        return alm.alm_vsfm_initialize(
            watsat[cols], hksat[cols], bsw[cols], sucsat[cols], res[cols],
            dz[cols], np.ones(len(cols)), P0=P0[cols])

    prob = make(list(range(ncol)))
    alm.alm_vsfm_solve(prob, 1800.0, qflx_infl=np.full(ncol, 2e-4),
                       qflx_tran_veg=np.full(ncol, 1e-4), rootr=rootr)
    P_batched = np.asarray(prob.P)
    for c in range(ncol):
        pc = make([c])
        alm.alm_vsfm_solve(pc, 1800.0, qflx_infl=np.full(1, 2e-4),
                           qflx_tran_veg=np.full(1, 1e-4),
                           rootr=rootr[[c]])
        np.testing.assert_array_equal(np.asarray(pc.P)[0], P_batched[c])


def test_full_physics_on_production_path():
    """The ALM path solves the reference's full physics: TGDPB01 density
    dispatch and the smooth_brooks_corey_bz3 saturation family (the
    mpp_varctl defaults), not a simplified second implementation."""
    from mpp_tpu.ops import eos, satfunc as sf
    prob = _make_problem()
    g = prob.comp.goveqns[0]
    assert g.density_type == eos.DENSITY_TGDPB01
    assert np.all(g.sat_params.sat_func_type
                  == sf.SAT_FUNC_SMOOTHED_BROOKS_COREY)
    # dyn staging matches the per-cell SatParams setters bitwise
    nz = prob.nz
    dyn_sat = prob.dyn[0]["sat"]
    for k in ("alpha", "bc_lambda", "sbc_pu", "sbc_b2", "sbc_b3"):
        np.testing.assert_allclose(np.asarray(dyn_sat[k])[0],
                                   np.asarray(getattr(g.sat_params, k))[:nz],
                                   rtol=0, atol=0)
    # reference condition list (Initialize.F90:836-870)
    assert list(prob.ss_slices) == [
        "Infiltration_Flux", "Evapotranspiration_Flux", "Dew_Flux",
        "Drainage_Flux", "Snow_Disappearance_Flux", "Sublimation_Flux"]


def test_et_sink_dries_root_zone():
    prob = _make_problem()
    prob.P = jnp.full((prob.ncol, prob.nz), 9.0e4, prob.P.dtype)
    rootr = np.zeros((prob.ncol, prob.nz))
    rootr[:, -5:] = 0.2                       # roots in the top 5 layers
    m0 = np.asarray(alm.cell_mass_kg(prob, prob.P)).sum(axis=1)
    out = alm.alm_vsfm_solve(prob, 1800.0,
                             qflx_tran_veg=np.full(prob.ncol, 2e-4),
                             rootr=rootr)
    m1 = np.asarray(alm.cell_mass_kg(prob, prob.P)).sum(axis=1)
    assert np.all(m1 < m0)
    assert out["abs_mass_error_col"] < alm.MAX_ABS_MASS_ERROR_COL


def test_drainage_split_below_water_table():
    """Drainage sinks distribute below the water table proportional to
    dz with the watmin limiter (Driver:330-370)."""
    prob = _make_problem(nz=10)
    # saturated bottom half, dry top
    Pcol = np.concatenate([np.full(5, 1.5e5), np.full(5, 2.0e3)])
    prob.P = jnp.asarray(np.tile(Pcol, (prob.ncol, 1)))
    m0 = np.asarray(alm.cell_mass_kg(prob, prob.P))
    out = alm.alm_vsfm_solve(prob, 600.0,
                             qflx_drain=np.full(prob.ncol, 1e-3))
    m1 = np.asarray(alm.cell_mass_kg(prob, prob.P))
    assert out["abs_mass_error_col"] < alm.MAX_ABS_MASS_ERROR_COL
    # drainage removes water, preferentially from the saturated zone
    assert np.all(m1.sum(axis=1) < m0.sum(axis=1))
    assert np.all(out["qflx_drain_tot"] > 0)


def test_seepage_bc_sheds_excess_water():
    """Saturated column with ongoing infiltration and the seepage BC
    (Initialize.F90:867-870, Driver:538-545): excess water leaves through
    the surface, qflx_seepage ~ infiltration rate, audit closed."""
    ncol, nz = 4, 10
    soil = _soil_kwargs(ncol, nz)
    prob = alm.alm_vsfm_initialize(P0=np.full((ncol, nz), 1.05e5),
                                   include_seepage_bc=True, **soil)
    qinfl = np.full(ncol, 1e-3)
    out = alm.alm_vsfm_solve(prob, 1800.0, qflx_infl=qinfl)
    assert out["abs_mass_error_col"] < alm.MAX_ABS_MASS_ERROR_COL
    np.testing.assert_allclose(np.asarray(out["qflx_seepage"]), qinfl,
                               rtol=2e-3)


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
    real = alm._audit_err

    def fake(*args):
        calls["n"] += 1
        err = real(*args)
        return err + 1.0 if calls["n"] == 1 else err

    monkeypatch.setattr(alm, "_audit_err", fake)
    out = alm.alm_vsfm_solve(prob, 600.0)
    assert out["mass_bal_err_count"] == 1
    assert out["attempts"] == 2
    assert out["abs_mass_error_col"] < alm.MAX_ABS_MASS_ERROR_COL


def test_retry_ladder_aborts_after_max_attempts(monkeypatch):
    prob = _make_problem()
    monkeypatch.setattr(
        alm, "_audit_err",
        lambda *a: np.full((prob.ncol,), 1.0))
    with pytest.raises(RuntimeError, match="failed to converge"):
        alm.alm_vsfm_solve(prob, 600.0)


def test_f32_escalates_failing_columns_to_f64():
    """f32 state with a stiff infiltration front: the audit catches the
    f32 mass drift (KNOWN_GAPS #9) and the driver re-solves the failing
    columns in f64 (bounded, per-column), landing under the 1e-5 kg
    threshold.  Columns without stiff forcing keep their f32 solve."""
    ncol, nz = 8, 48
    soil = _soil_kwargs(ncol, nz, dz=0.05)
    prob = alm.alm_vsfm_initialize(P0=np.full((ncol, nz), 1.0e3),
                                   dtype=jnp.float32, **soil)
    # stiff front on half the columns only
    qinfl = np.zeros(ncol)
    qinfl[: ncol // 2] = 8e-3
    out = alm.alm_vsfm_solve(prob, 3600.0, qflx_infl=qinfl)
    assert out["escalated_cols"] == ncol // 2
    assert out["abs_mass_error_col"] < alm.MAX_ABS_MASS_ERROR_COL
    assert prob.P.dtype == jnp.float32


def test_frac_ice_stages_frac_liq_and_splits_mass():
    """frac_liq = 1 - frac_ice staged per step (Driver:445-465); the
    unpack splits cell mass by frac_ice (Driver:840-843)."""
    prob = _make_problem()
    fi = np.zeros((prob.ncol, prob.nz))
    fi[:, :3] = 0.5                           # icy bottom layers
    out = alm.alm_vsfm_solve(prob, 600.0, frac_ice=fi)
    liq = np.asarray(out["h2osoi_liq"])
    ice = np.asarray(out["h2osoi_ice"])
    np.testing.assert_allclose(ice[:, :3], liq[:, :3], rtol=1e-12)
    assert np.all(ice[:, 3:] == 0.0)


def test_lateral_ghost_exchange_sharded():
    """Lateral path on the 8-device CPU mesh: wet and dry column groups
    relax toward each other through ppermute halos; mass is conserved."""
    ndev = len(jax.devices())
    from mpp_tpu.parallel.sharding import column_mesh, shard_columns
    mesh = column_mesh(ndev)
    ncol = 2 * ndev
    soil = _soil_kwargs(ncol, 8)
    P0 = np.full((ncol, 8), 3.5355e3)
    P0[: ncol // 2] = 9.0e4                   # left half wet
    prob = alm.alm_vsfm_initialize(
        P0=P0, lateral_connectivity=True, lateral_conductance=1e-10,
        device_mesh=mesh, **soil)
    prob.P = shard_columns(prob.P, mesh)
    m0 = float(np.asarray(alm.cell_mass_kg(prob, prob.P)).sum())
    out = alm.alm_vsfm_solve(prob, 600.0)
    m1 = float(np.asarray(alm.cell_mass_kg(prob, prob.P)).sum())
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
    physical per-level lateral Darcy flux, sharded on the 8-device mesh,
    cross-checked against the serial global evaluation."""
    from jax.sharding import Mesh
    from mpp_tpu.parallel.ugrid import UGrid, lateral_darcy_source_global

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
    soil = _soil_kwargs(ncol, nz)
    prob = alm.alm_vsfm_initialize(
        P0=P0, lateral_connectivity=True, device_mesh=mesh, ugrid=ug,
        **soil)
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
    kr = np.asarray(alm._cell_kr(prob, P))
    perm = np.asarray(prob.dyn[0]["perm"][..., 0])
    dz = jnp.asarray(prob.dz, P.dtype)
    src_serial = np.asarray(lateral_darcy_source_global(
        ug, P, jnp.asarray(kr), jnp.asarray(perm), dz))
    np.testing.assert_allclose(src_sharded, src_serial, rtol=1e-12,
                               atol=1e-20)
