"""Three-media (snow/SSW/soil) thermal coupling: physics tests.

No reference golden exists for the 3-mesh configuration (it only runs
inside E3SM), so these assert conservation laws and coupling physics
(VERDICT r1 item 4; GoveqnThermalKSPTemperatureSnowType.F90:1007-1300,
MultiPhysicsProbThermal.F90:76-211, MPPThermalTBasedALM_Initialize.F90)."""
import numpy as np
import jax.numpy as jnp
import pytest

from mpp_tpu.problems.thermal_3media import (ThreeMediaProblem, NLEVSNO,
                                             NLEVGRND)
from mpp_tpu.constants import TFRZ


def test_equilibrium_is_invariant():
    """Uniform temperature + zero fluxes must stay exactly put — any
    asymmetry in the cross-mesh coupling would drift it."""
    p = ThreeMediaProblem()
    T0 = TFRZ - 2.0
    p.set_initial_temperature(T0, T0, T0)
    p.set_top_fluxes(0.0, 0.0, 0.0)
    Ts, Tw, Tg = p.step(1800.0)
    for arr in (Ts, Tw, Tg):
        np.testing.assert_allclose(arr, T0, rtol=0, atol=1e-8)


def test_energy_conservation_under_flux():
    """Crank-Nicolson with flux BCs: total energy change per step equals
    dt * (sum of boundary fluxes); internal + cross-media fluxes cancel."""
    p = ThreeMediaProblem()
    p.set_initial_temperature(TFRZ - 5.0, TFRZ - 1.0, TFRZ + 2.0)
    fluxes = (-30.0, 0.0, 0.0)          # cooling at the snow top
    p.set_top_fluxes(*fluxes)
    dt = 600.0
    e0 = p.energy(p.mpp.soe.soln_prev)
    p.step(dt)
    e1 = p.energy()
    expected = dt * sum(fluxes)
    assert abs((e1 - e0) - expected) < 1e-4 * abs(expected), \
        f"dE={e1 - e0:.6f} vs flux*dt={expected:.6f}"


def test_cooling_propagates_through_media():
    """Sustained cooling at the snow top must cool snow first, soil last,
    with a monotonic temperature profile through the pack."""
    p = ThreeMediaProblem()
    p.set_initial_temperature(TFRZ - 1.0, TFRZ - 1.0, TFRZ - 1.0)
    p.set_top_fluxes(-50.0, 0.0, 0.0)
    for _ in range(20):
        Ts, Tw, Tg = p.step(600.0)
    # snow surface colder than snow bottom, colder than deep soil
    assert Ts[0] < Ts[-1] < Tg[-1]
    # monotonic within the snow pack
    assert np.all(np.diff(Ts) > 0)
    # deep soil barely moved
    assert abs(Tg[-1] - (TFRZ - 1.0)) < 0.5


def test_inter_media_flux_continuity_steady_state():
    """Drive to steady state with +Q at soil bottom region equivalent:
    cool the snow top, warm nothing else; at steady state the conductive
    flux is uniform through every interface, so the temperature drops
    across each medium scale inversely with conductivity."""
    p = ThreeMediaProblem()
    p.set_initial_temperature(TFRZ - 2.0, TFRZ - 2.0, TFRZ - 2.0)
    Q = -10.0
    p.set_top_fluxes(Q, 0.0, 0.0)
    # fix the deep-soil temperature by a large heat capacity trick:
    # instead iterate long enough that the profile is quasi-linear in the
    # snow (steady flux), then check Fourier's law across snow layers
    for _ in range(400):
        Ts, Tw, Tg = p.step(3600.0)
    ge = p.ge_snow
    k_snow, _ = ge.aux(None)
    k = float(np.asarray(k_snow)[0])
    dz = float(np.asarray(ge.mesh.dz)[0])
    grad = np.diff(Ts) / dz
    flux_num = -k * grad
    # interior snow interfaces carry the imposed flux Q (sign: Q<0 cools
    # the top, heat flows upward -> flux = Q through every interface)
    np.testing.assert_allclose(flux_num, Q, rtol=0.05)


def test_partial_snow_activation():
    """With only 2 of 5 snow layers active, the top heat-flux connection
    rewires to the topmost ACTIVE layer and inactive cells hold identity
    rows (ThermKSPTempSnowUpdateBoundaryConn:680-689)."""
    p = ThreeMediaProblem()
    nsl = 2
    active = np.zeros(NLEVSNO, bool)
    active[NLEVSNO - nsl:] = True
    from mpp_tpu.constants import AuxVarKind, Var
    p.mpp.set_r_data(AuxVarKind.INTERNAL, Var.NUM_SNOW_LYR, p.i_snow,
                     np.full(NLEVSNO, nsl))
    p.mpp.set_r_data(AuxVarKind.INTERNAL, Var.ACTIVE, p.i_snow,
                     active.astype(np.int64))
    p.ge_snow.update_top_flux_conn()
    assert int(p.ge_snow.boundary_conditions[0].conn_set.id_dn[0]) \
        == NLEVSNO - nsl

    T0 = TFRZ - 3.0
    p.set_initial_temperature(T0, T0, T0)
    p.set_top_fluxes(-40.0, 0.0, 0.0)
    Ts, Tw, Tg = p.step(600.0)
    # inactive layers solve the identity row with zero RHS (the
    # reference's VecZeroEntries + unit diagonal => 0; the host model
    # never reads inactive cells back)
    np.testing.assert_allclose(Ts[:NLEVSNO - nsl], 0.0, atol=1e-12)
    # active top layer cooled
    assert Ts[NLEVSNO - nsl] < T0 - 0.01
