"""vsfm_manoli2014: 3-GE SPAC network (soil/root/xylem Darcy coupling).

No reference regression golden exists (the driver is not in any suite),
so the test asserts physics: global mass conservation of the closed
network, gravity-driven redistribution, and inter-GE pressure coupling.
"""
import numpy as np
import pytest

from mpp_tpu.constants import AuxVarKind, Var
from mpp_tpu.ops import satfunc as sf
from mpp_tpu.problems.vsfm_manoli2014 import (
    NZ_ROOT, NZ_SOIL, NZ_XYLEM, PRESS_INITIAL, build_vsfm_manoli2014,
    run_vsfm_manoli2014_problem)


def _total_water(mpp):
    """sum rho0*sat*por*vol over every GE (density constant, porosity
    constant -> mass tracks sat*por*vol).  Pressures come from the SoE
    solution vector (per-GE ``pressure`` is staged only after a solve)."""
    soe = mpp.soe
    x = np.asarray(soe.soln)
    total = 0.0
    for g, off in zip(soe.goveqns, soe.offsets[:-1]):
        P = x[off:off + g.mesh.ncells_local]
        sat, _ = sf.press_to_sat(g.sat_params, P)
        total += float(np.sum(np.asarray(sat) * g.por_params.porosity_base
                              * g.mesh.vol))
    return total


@pytest.fixture(scope="module")
def solved():
    mpp = build_vsfm_manoli2014()
    m0 = _total_water(mpp)
    for istep in range(1, 4):
        converged, reason = mpp.soe.step_dt(8640.0, istep)
        assert converged, reason
    return mpp, m0


def test_shapes(solved):
    mpp, _ = solved
    P = mpp.get_data(AuxVarKind.INTERNAL, Var.PRESSURE)
    assert P.shape == (NZ_SOIL + NZ_ROOT + NZ_XYLEM,)


def test_mass_conserved(solved):
    """Closed network: no BCs or sinks, so total water is invariant."""
    mpp, m0 = solved
    m1 = _total_water(mpp)
    assert abs(m1 - m0) / m0 < 1e-9


def test_gravity_redistribution(solved):
    """Uniform-P IC is not a gravity equilibrium: water drains downward,
    so soil-column pressure must increase with depth after stepping."""
    mpp, _ = solved
    P = np.asarray(mpp.soe.goveqns[0].pressure)
    assert P[-1] > P[0]
    assert not np.allclose(P, PRESS_INITIAL)


def test_xylem_drains_to_root(solved):
    """The 17-m xylem column drains into the root system (no supply at
    the crown), so the crown-top cell develops the strongest tension."""
    mpp, _ = solved
    Px = np.asarray(mpp.soe.goveqns[2].pressure)
    assert Px[0] == Px.min()
    # net head gradient points downward (crown much drier than base)
    assert Px[-1] - Px[0] > 1000.0


def test_coupling_transfers_water(solved):
    """Root pressures must have moved off the IC via the soil/xylem
    coupling (they have no other forcing)."""
    mpp, _ = solved
    Pr = np.asarray(mpp.soe.goveqns[1].pressure)
    assert np.max(np.abs(Pr - PRESS_INITIAL)) > 1.0


def test_runner_smoke():
    mpp = run_vsfm_manoli2014_problem(dtime=8640.0, nstep=1)
    assert len(mpp.soe.goveqns) == 3
