"""Batched end-to-end canopy pipeline (lwv -> lbl -> psy -> mlc) — the
TPU production path for the ml_model substep loop.  Physics-envelope
tests: the fully-jitted substep must converge to a physical canopy state
and be batch-consistent (every identical column produces the identical
answer)."""
import jax
import numpy as np
import pytest

from mpp_tpu.batched.canopy_pipeline import CanopyPipeline


@pytest.fixture(scope="module")
def pipe():
    return CanopyPipeline(ncair=4)


def test_substep_physical_envelope(pipe):
    state = pipe.initial_state()
    step = jax.jit(lambda s: pipe.substep(s))
    for _ in range(6):
        state = step(state)
    T_air = np.asarray(state.T_air)
    q_air = np.asarray(state.q_air)
    T_sun = np.asarray(state.T_sun)
    dpai_pos = np.asarray(pipe.dpai_pos)

    assert np.isfinite(T_air).all() and np.isfinite(q_air).all()
    # canopy air within a plausible band around the 295.9 K forcing
    assert (T_air > 270.0).all() and (T_air < 320.0).all()
    # specific humidity physical
    assert (q_air >= 0.0).all() and (q_air < 0.05).all()
    # sunlit leaves warmer than shaded at midday forcing (absorbed SW)
    T_shd = np.asarray(state.T_shd)
    assert (T_sun[:, dpai_pos] >= T_shd[:, dpai_pos] - 0.5).all()

    # batch consistency: all identical columns identical
    for arr in (T_air, q_air, T_sun, T_shd):
        assert np.abs(arr - arr[:1]).max() <= 1e-12


def test_substep_approaches_steady_state(pipe):
    state = pipe.initial_state()
    step = jax.jit(lambda s: pipe.substep(s))
    prev = None
    for _ in range(12):
        prev = state
        state = step(state)
    d = float(np.abs(np.asarray(state.T_air) - np.asarray(prev.T_air)).max())
    assert d < 0.5, f"canopy not settling (|dT| {d} K/substep)"


def _run_parity(forcing_kwargs=None, nsub=3):
    """Parity harness (VERDICT r2 item 4 / r3 item 6): the batched
    pipeline's full substep chain (turbulence -> longwave -> LBL ->
    photosynthesis -> MLC) against an independently-composed SERIAL
    substep built from the golden-verified serial components
    (models/canopy_turbulence, models/radiation KSP, models/lbl,
    models/photosynthesis Newton, models/mlc CSR+GMRES), both advanced
    ``nsub`` substeps from the same initial state with the SAME hourly
    forcing record (``forcing_kwargs`` -> pipe.make_forcing, exercising
    the time-varying shortwave/sky/atmosphere plumbing end to end)."""
    import jax
    import jax.numpy as jnp
    from mpp_tpu.batched.canopy_pipeline import CanopyPipeline, CanopyState
    from mpp_tpu.models.canopy_turbulence import (
        CanopyTurbulenceAuxVar, obukhov_length, wind_profile,
        aerodynamic_conductances)
    from mpp_tpu.models.mlc import MLCMPP
    from mpp_tpu.models import photosynthesis as ph
    from mpp_tpu.models.radiation import _solve_ksp
    from mpp_tpu.ops.sparse import csr_template
    from mpp_tpu.problems import mlc as mlc_problem
    from mpp_tpu.problems.photosynthesis import (_canopy_mesh,
                                                 _set_soil_parameters)
    from mpp_tpu.constants import MM_H2O, MM_DRY_AIR, MPPType

    pipe = CanopyPipeline(ncair=1, dtype=jnp.float64)
    nlev = pipe.nlev
    dt = 300.0

    # hourly forcing record drives BOTH paths: batched via the Forcing
    # jit input, serial via the pipe attribute staging below
    f = (pipe.make_forcing(**forcing_kwargs) if forcing_kwargs
         else pipe.default_forcing)
    pipe.apar_sun = np.asarray(f.apar_sun)
    pipe.apar_shd = np.asarray(f.apar_shd)
    pipe.rn_sw_sun = np.asarray(f.rn_sw_sun)
    pipe.rn_sw_shd = np.asarray(f.rn_sw_shd)
    pipe.isoil_sw = float(f.isoil_sw)
    pipe.fssh_lev = np.asarray(f.fssh_lev)
    pipe.tref = float(f.tref)
    pipe.qref = float(f.qref)
    pipe.uref = float(f.uref)
    pipe.soil_T_forcing = float(f.soil_T)
    pipe.lw.bc_Idn = jnp.full(1, float(f.irsky))
    pipe.lw.trans = jnp.asarray(np.asarray(f.lw_trans), jnp.float64)

    # ---- serial photosynthesis MPP, staged like pipe.__post_init__ ----
    psy = ph.PhotosynthesisMPP()
    psy.set_id(MPPType.PHOTOSYNTHESIS_SNES)
    psy.add_mesh(_canopy_mesh(2, 1, pipe.nz_cair))   # 2*nlev leaf cells
    psy.add_goveqn()
    psy.allocate_auxvars(ph.PATHWAY_C3, ph.SCM_MEDLYN)
    psy.setup_problem()
    av = psy.soe.ge.avars
    dpai_n2 = np.tile(pipe.dpai_lev, 2)
    av.pref[:] = pipe.pref
    av.cair[:] = pipe.co2ref
    av.o2ref[:] = pipe.o2ref
    av.btran[:] = 1.0
    av.dpai[:] = dpai_n2
    av.root_biomass[:] = 500.0
    av.root_radius[:] = 0.29e-3
    av.root_density[:] = 0.31e6
    av.root_resist[:] = 25.0
    _set_soil_parameters(av)
    av.leaf_psi[:] = -1.5
    av.leaf_height[:] = 15.0
    av.leaf_capc[:] = 2500.0
    av.leaf_minlwp[:] = -2.0
    av.leaf_lai[:] = 500.0
    av.k_stem2leaf[:] = 4.0

    # ---- serial longwave CSR template over pipe.lw's topology ----
    lw = pipe.lw
    r, c = lw.coo_coords()
    n_lw = lw.mesh.ncells_local * lw.dof
    lw_tpl = csr_template(n_lw, n_lw, r, c)
    lw_cache = {}

    lbl = pipe.lbl
    dpai_pos = np.asarray(pipe.dpai_lev) > 0.0
    fssh = np.asarray(pipe.fssh_lev)

    def serial_substep(T_air, q_air, T_sun, T_shd):
        """Numpy/serial composition with the pipeline's exact staging."""
        # turbulence (serial golden path) for the LBL wind profile
        ct = CanopyTurbulenceAuxVar(1, nlev)
        ct.pai[0] = mlc_problem.PAI
        ct.hc[0] = mlc_problem.HC
        ct.zref[0] = 46.0
        ct.pref[0] = pipe.pref
        ct.uref[0] = pipe.uref
        ct.tref[0] = pipe.tref
        ct.qref[0] = pipe.qref
        ct.compute_derived_atm_inputs(0)
        tcan = T_air[pipe.ntop - 1]
        eair_top = q_air[pipe.ntop - 1] * pipe.pref
        factor = (MM_H2O / MM_DRY_AIR) / (
            pipe.pref - (1.0 - MM_H2O / MM_DRY_AIR) * eair_top)
        ct.tcan[0] = tcan
        ct.qcan[0] = eair_top * factor
        obukhov_length(ct)
        wind_profile(ct)
        aerodynamic_conductances(ct)
        wind = np.asarray(ct.wind[0])

        # longwave through the serial KSP (GMRES+ILU) path
        gt = np.zeros(nlev)
        gt[0] = T_air[0]
        lw.ground_temperature = jnp.asarray(gt)
        lw.leaf_temperature = jnp.stack(
            [jnp.asarray(T_sun), jnp.asarray(T_shd)], axis=1)
        lw.leaf_fssh = jnp.stack([jnp.asarray(fssh),
                                  jnp.asarray(1.0 - fssh)], axis=1)
        x_lw, _, conv = _solve_ksp(lw_tpl, lw.matrix_values(), lw.rhs(),
                                   lw_cache)
        assert conv
        iabs = x_lw.reshape(nlev, lw.dof)[:, 2]
        dpai = np.asarray(pipe.dpai_lev)
        labs = np.where(dpai_pos, iabs / np.where(dpai == 0, 1.0, dpai),
                        0.0)
        labs_soil = iabs[0]

        # leaf boundary layer (serial component, f64)
        tleaf2 = np.concatenate([T_sun, T_shd])
        lbl.tleaf = jnp.asarray(tleaf2)
        lbl.tair = jnp.asarray(np.tile(T_air, 2))
        lbl.wind = jnp.asarray(np.tile(wind, 2))
        lbl.pref = jnp.full(2 * nlev, pipe.pref)
        lbl.tref = jnp.full(2 * nlev, pipe.tref)
        lbl.compute()
        gbh2 = np.asarray(lbl.gbh)
        gbv2 = np.asarray(lbl.gbv)
        gbc2 = np.asarray(lbl.gbc)

        # photosynthesis through the serial Newton
        av.tleaf[:] = tleaf2
        av.gbv[:] = gbv2
        av.gbc[:] = gbc2
        av.eair[:] = np.tile(q_air * pipe.pref, 2)
        av.apar[:nlev] = np.asarray(pipe.apar_sun[0])
        av.apar[nlev:] = np.asarray(pipe.apar_shd[0])
        av.determine_if_solution_is_bounded()
        psy.soe.soln[:] = 0.9 * pipe.co2ref
        ok, reason = psy.soe.step_dt(dt, 1)
        assert ok, reason
        gs2 = np.where(av.soln_is_bounded[:, 0], av.gs[:, 0], ph.GS_MIN)

        # MLC through the serial CSR + GMRES+ILU path (its PreSolve
        # re-runs the Obukhov chain from the staged cturb state)
        m = MLCMPP(ncair=1, ntree=1, nz_cair=pipe.nz_cair)
        mc = m.cturb
        mc.pai[0] = mlc_problem.PAI
        mc.hc[0] = mlc_problem.HC
        mc.zref[0] = 46.0
        mc.pref[0] = pipe.pref
        mc.uref[0] = pipe.uref
        mc.tref[0] = pipe.tref
        mc.qref[0] = pipe.qref
        mc.compute_derived_atm_inputs(0)
        # canopy-top state staged by the driver each substep
        # (mlc.F90:447-506 / ml_model solve_mlc)
        mc.tcan[0] = tcan
        mc.qcan[0] = eair_top * factor
        mc.soil_tk[0] = pipe.soil_tk
        mc.soil_dz[0] = pipe.soil_dz
        mc.soil_temperature[0] = pipe.soil_T_forcing
        mc.soil_res[0] = pipe.soil_res
        mc.soil_rhg[0] = pipe.soil_rhg
        mc.soil_rn[0] = pipe.isoil_sw + labs_soil
        gs_sun, gs_shd = gs2[:nlev], gs2[nlev:]
        gbh_sun, gbh_shd = gbh2[:nlev], gbh2[nlev:]
        gbv_sun, gbv_shd = gbv2[:nlev], gbv2[nlev:]
        fdry = np.where(dpai_pos, mlc_problem.FDRY, 0.0)
        for arrs in ((m.at_leaf_dpai, m.at_leaf_fwet, m.at_leaf_fdry,
                      m.at_leaf_gs, m.at_leaf_fssh, m.at_gbh),
                     (m.av_leaf_dpai, m.av_leaf_fwet, m.av_leaf_fdry,
                      m.av_leaf_gs, m.av_leaf_fssh, m.av_gbv)):
            a_dpai, a_fwet, a_fdry, a_gs, a_fssh, a_gb = arrs
            a_dpai[:, 0] = dpai
            a_dpai[:, 1] = dpai
            a_fwet[:] = 0.0
            a_fdry[:, 0] = fdry
            a_fdry[:, 1] = fdry
            a_gs[:, 0] = gs_sun
            a_gs[:, 1] = gs_shd
            a_fssh[:, 0] = fssh
            a_fssh[:, 1] = 1.0 - fssh
        m.at_gbh[:, 0] = gbh_sun
        m.at_gbh[:, 1] = gbh_shd
        m.av_gbv[:, 0] = gbv_sun
        m.av_gbv[:, 1] = gbv_shd
        m.at_is_soil[0] = True
        m.av_is_soil[0] = True
        rn_sun = np.asarray(pipe.rn_sw_sun[0]) + labs
        rn_shd = np.asarray(pipe.rn_sw_shd[0]) + labs
        for rk, (gb_rn, gb_T) in enumerate(((rn_sun, T_sun),
                                            (rn_shd, T_shd))):
            ge = m.leaf[rk]
            ge["gbh"][:] = gbh_sun if rk == 0 else gbh_shd
            ge["gbv"][:] = gbv_sun if rk == 0 else gbv_shd
            ge["cp"][:] = mlc_problem.CP_LEAF
            ge["fwet"][:] = 0.0
            ge["fdry"][:] = fdry
            ge["dpai"][:] = dpai
            ge["fssh"][:] = fssh if rk == 0 else 1.0 - fssh
            ge["gs"][:] = gs_sun if rk == 0 else gs_shd
            ge["rn"][:] = gb_rn
        o = m.off
        m.soln[o[0]:o[0] + m.Na] = T_air
        m.soln[o[1]:o[1] + m.Na] = q_air
        m.soln[o[2]:o[2] + m.Nl] = T_sun
        m.soln[o[3]:o[3] + m.Nl] = T_shd
        m.soln_prev[:] = m.soln
        # exact serial solve (dense LU of the assembled CSR system): the
        # batched path's block-Thomas is exact, so comparing against the
        # GMRES(rtol 1e-5) iterate would only measure the Krylov stop
        # band (~5 mK); the exact-vs-exact comparison isolates real
        # assembly/staging drift
        m.dtime = dt
        m._vol_air = m._compute_vol_air()
        m.pre_solve()
        b = m.compute_rhs()
        rows, cols, vals = m.compute_operators()
        A = np.zeros((m.n, m.n))
        np.add.at(A, (rows, cols), vals)
        x = np.linalg.solve(A, b)
        m.soln_prev[:] = m.soln
        m.soln[:] = x
        m.post_solve()
        Tn_sun = np.where(dpai_pos, m.leaf[0]["T"], T_sun)
        Tn_shd = np.where(dpai_pos, m.leaf[1]["T"], T_shd)
        return (m.at_T.copy(), m.av_q.copy(), Tn_sun, Tn_shd)

    # ---- advance both for 3 substeps from the same IC ----
    state = pipe.initial_state()
    s = [np.asarray(state.T_air[0]), np.asarray(state.q_air[0]),
         np.asarray(state.T_sun[0]), np.asarray(state.T_shd[0])]
    for sub in range(nsub):
        s = list(serial_substep(*s))
        state = pipe.substep(state, dt, f)
        for got, want, name, tol in (
                (np.asarray(state.T_air[0]), s[0], "T_air", 1e-5),
                (np.asarray(state.q_air[0]), s[1], "q_air", 1e-8),
                (np.asarray(state.T_sun[0]), s[2], "T_sun", 1e-5),
                (np.asarray(state.T_shd[0]), s[3], "T_shd", 1e-5)):
            err = np.abs(got - want).max()
            assert err < tol, (sub, name, err)


def test_pipeline_matches_serial_composition():
    """Default (midday build-time) forcing parity."""
    _run_parity(None)


def test_diurnal_forcing_parity():
    """Time-varying forcing records through the SAME parity harness:
    morning sun angle / weaker sky flux and a cool evening record — the
    hourly shortwave re-solve and sky/atmosphere staging reach the
    batched stages exactly as the serial composition (VERDICT r3
    item 6)."""
    _run_parity(dict(sza=1.2, iskyb=(120.0, 120.0), iskyd=(40.0, 10.0),
                     irsky=350.0, tref=288.0, qref=0.007), nsub=2)
    _run_parity(dict(sza=1.45, iskyb=(5.0, 5.0), iskyd=(2.0, 0.5),
                     irsky=320.0, tref=283.0, qref=0.006, uref=3.0,
                     soil_T=290.0), nsub=2)


def test_diurnal_run_and_checkpoint():
    """24-hour batched diurnal loop (compressed: 8 hourly records x 2
    substeps) with the synthetic diurnal BC provider: hourly shortwave
    re-solves feed the jitted stages as dynamic inputs (no retrace),
    the canopy-top temperature tracks the diurnal forcing, and the
    binary checkpoint round-trips bitwise."""
    import tempfile
    import jax
    import jax.numpy as jnp
    from mpp_tpu.problems.ml_model import synthetic_diurnal_bc

    pipe = CanopyPipeline(ncair=2, dtype=jnp.float32)
    state = pipe.initial_state()
    with tempfile.TemporaryDirectory() as d:
        state, traj = pipe.run_diurnal(
            state, beg_step=6, end_step=13, nsubstep=2,
            bc_provider=synthetic_diurnal_bc, checkpoint_dir=d)
        # physical + diurnal signal: canopy-top air warms from early
        # morning (hour 6) into midday (hour 13)
        T6 = traj[6][0]
        T13 = traj[13][0]
        assert np.isfinite(np.asarray(state.T_air)).all()
        assert (np.asarray(state.T_air) > 260.0).all()
        assert (np.asarray(state.T_air) < 330.0).all()
        assert (T13 > T6).all(), (T6, T13)
        # checkpoint round-trip
        fname = pipe.checkpoint(state, 13, 2, d)
        back = pipe.restore(fname)
        for a, b in zip(state, back):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_hour_matches_staged_composition():
    """The one-dispatch-per-hour fused program (fused_hour_fn) is the
    same substep composition as the 3-stage path: identical state after
    an hourly record's 12 substeps."""
    import jax
    import numpy as np
    from mpp_tpu.batched.canopy_pipeline import CanopyPipeline

    pipe = CanopyPipeline(ncair=2)
    s0 = pipe.initial_state()
    fns = pipe.staged_substep_fns(jax)
    s_staged = s0
    for _ in range(3):
        s_staged = pipe.run_staged(fns, s_staged)
    hour = pipe.fused_hour_fn(jax, nsubstep=3)
    s_fused = hour(s0, pipe.default_forcing)
    # XLA fuses differently inside the fori_loop body than across the
    # 3 program boundaries; observed reordering noise is ~4e-12 K
    for a, b in zip(s_staged, s_fused):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-9)
