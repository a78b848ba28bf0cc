"""th_manoli2014: 6-GE coupled thermal-hydrology SPAC network.

No reference golden exists; the checks are conservation (closed network)
and cross-validation of the mass physics against the vsfm_manoli2014
driver, which solves the identical hydraulic problem through the
BC-coupling formulation instead of SoE-level coupling connections.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from mpp_tpu.problems.th_manoli2014 import (TEMP_INITIAL,
                                            build_th_manoli2014,
                                            run_th_manoli2014_problem)

NSTEP = 3
DT = 8640.0


def _totals(soe, X):
    P, T = soe._split(jnp.asarray(X))
    m = e = 0.0
    for i, (gm, ge) in enumerate(zip(soe.mass_ges, soe.energy_ges)):
        gm.temperature = T[i]
        m += float(jnp.sum(gm.accum(P[i])))
        e += float(jnp.sum(ge.accum_e(T[i], P[i])))
    return m, e


@pytest.fixture(scope="module")
def solved():
    mpp = build_th_manoli2014()
    m0, e0 = _totals(mpp.soe, mpp.soe.soln)
    for istep in range(1, NSTEP + 1):
        converged, reason = mpp.soe.step_dt(DT, istep)
        assert converged, reason
    return mpp, m0, e0


def test_mass_and_energy_conserved(solved):
    mpp, m0, e0 = solved
    m1, e1 = _totals(mpp.soe, mpp.soe.soln)
    assert abs(m1 - m0) / m0 < 1e-12
    assert abs(e1 - e0) / abs(e0) < 1e-12


def test_temperature_stays_isothermal(solved):
    """Uniform-T IC with no heat sources: only enthalpy redistribution
    with the moving water perturbs T, by well under 0.01 K."""
    mpp, _, _ = solved
    X = np.asarray(mpp.soe.soln)
    T = X[mpp.soe.ntot:]
    assert np.max(np.abs(T - TEMP_INITIAL)) < 0.01
    assert np.max(np.abs(T - TEMP_INITIAL)) > 0.0   # but it does move


def test_mass_physics_matches_vsfm_manoli(solved):
    """The hydraulic trajectory equals vsfm_manoli2014's (same meshes,
    materials, IC; formulated via swapped coupling BCs there vs a single
    conservative coupling flux here)."""
    from mpp_tpu.problems.vsfm_manoli2014 import build_vsfm_manoli2014
    vs = build_vsfm_manoli2014()
    for istep in range(1, NSTEP + 1):
        converged, _ = vs.soe.step_dt(DT, istep)
        assert converged
    P_vsfm = np.asarray(vs.soe.soln)
    mpp, _, _ = solved
    P_th = np.asarray(mpp.soe.soln)[:mpp.soe.ntot]
    span = P_vsfm.max() - P_vsfm.min()
    assert np.max(np.abs(P_th - P_vsfm)) / span < 1e-6


def test_runner_smoke():
    mpp = run_th_manoli2014_problem(dtime=8640.0, nstep=1)
    assert len(mpp.soe.goveqns) == 6


def test_sparse_jacobian_matches_dense():
    """The colored-JVP compressed Jacobian equals the dense jacfwd on the
    reference mesh (VERDICT r2 item 7: correctness anchor for the
    linear-memory Jacobian)."""
    from functools import partial
    import jax
    import jax.numpy as jnp
    from mpp_tpu.problems.th_manoli2014 import build_th_manoli2014

    mpp = build_th_manoli2014()
    soe = mpp.soe
    dt = 8640.0
    am, ae = soe._accums(soe.soln_prev, dt)
    res = partial(soe._residual_pure, accum_prev_m=am, accum_prev_e=ae,
                  dt=dt)
    soe._build_jac_plan()
    plan = soe._jac_plan
    # colors bounded by stencil degree, not problem size
    assert plan["ncolors"] <= 40

    X = jnp.asarray(soe.soln)
    data = np.asarray(soe._sparse_jac_data(res, X))
    J_sparse = np.zeros((2 * soe.ntot, 2 * soe.ntot))
    tpl = plan["tpl"]
    J_sparse[tpl.row_ids(), tpl.indices] = data
    J_dense = np.asarray(jax.jacfwd(res)(X))
    scale = np.abs(J_dense).max()
    assert np.abs(J_sparse - J_dense).max() <= 1e-12 * scale
    # and the dense Jacobian has no entries outside the structural pattern
    mask = np.zeros_like(J_dense, bool)
    mask[tpl.row_ids(), tpl.indices] = True
    assert np.abs(np.where(mask, 0.0, J_dense)).max() == 0.0


def test_10x_mesh_solves_with_linear_memory():
    """th_manoli2014 at 10x every mesh (5000 unknowns) steps with the
    sparse path — the dense jacfwd would need 5000 forward passes and a
    25M-entry matrix; the colored plan needs ~15 JVPs and O(n) storage —
    and conserves mass exactly (closed network)."""
    from mpp_tpu.problems.th_manoli2014 import build_th_manoli2014

    mpp = build_th_manoli2014(scale=10)
    soe = mpp.soe
    assert 2 * soe.ntot == 5000
    mass0 = sum(float(np.sum(np.asarray(g.accum(
        soe.soln[soe.offsets[i]:soe.offsets[i + 1]]))))
        for i, g in enumerate(soe.mass_ges))
    ok, reason = soe.step_dt(8640.0)
    assert ok, reason
    assert soe._jac_plan["ncolors"] <= 40
    mass1 = sum(float(np.sum(np.asarray(g.accum(
        soe.soln[soe.offsets[i]:soe.offsets[i + 1]]))))
        for i, g in enumerate(soe.mass_ges))
    assert abs(mass1 - mass0) <= 1e-8 * abs(mass0)
