"""vsfm_sy1991: Srivastava & Yeh (1991) layered infiltration/drainage.

No reference golden exists (the driver is not registered in any
regression suite), so the tests assert the physics the paper's setup
implies: the spun-up profile is genuinely steady under its recharge, and
switching recharge drives a monotone wetting front.
"""
import numpy as np
import pytest

from mpp_tpu.constants import AuxVarKind, Var
from mpp_tpu.problems.vsfm_sy1991 import (
    _RECHARGE_DRYING, _RECHARGE_WETTING, _RHO, _build_mpp,
    _spinup_steady_ic, WETTING_PROBLEM, run_vsfm_sy1991_problem)

NZ = 60


@pytest.fixture(scope="module")
def drying_ic():
    return _spinup_steady_ic(NZ, _RECHARGE_DRYING, 101320.2)


def test_spinup_is_steady(drying_ic):
    """Stepping the spun-up profile under the SAME recharge must leave it
    unchanged (it is the steady state)."""
    mpp = _build_mpp(NZ)
    mpp.restart(drying_ic)
    mpp.set_data(AuxVarKind.SS, Var.BC_SS_CONDITION, 1,
                 np.full(1, _RECHARGE_DRYING * _RHO))
    mpp.set_data(AuxVarKind.BC, Var.BC_SS_CONDITION, 1,
                 np.full(1, 101320.2))
    converged, _ = mpp.soe.step_dt(3600.0, 1)
    assert converged
    P = np.asarray(mpp.get_data(AuxVarKind.INTERNAL, Var.PRESSURE))
    assert np.max(np.abs(P - drying_ic)) < 1.0     # [Pa]


def test_wetting_front_progresses(drying_ic):
    """Under the 9x larger wetting recharge the column wets from the top:
    top-cell pressure increases monotonically across hourly steps."""
    mpp = _build_mpp(NZ)
    mpp.restart(drying_ic)
    tops = [float(drying_ic[-1])]
    for istep in range(1, 7):
        mpp.set_data(AuxVarKind.SS, Var.BC_SS_CONDITION, 1,
                     np.full(1, _RECHARGE_WETTING * _RHO))
        mpp.set_data(AuxVarKind.BC, Var.BC_SS_CONDITION, 1,
                     np.full(1, 101281.1))
        converged, _ = mpp.soe.step_dt(3600.0, istep)
        assert converged
        P = np.asarray(mpp.get_data(AuxVarKind.INTERNAL, Var.PRESSURE))
        tops.append(float(P[-1]))
    assert all(b > a for a, b in zip(tops, tops[1:])), tops
    # front has not yet reached the low-K bottom half appreciably
    assert abs(float(P[NZ // 4]) - drying_ic[NZ // 4]) < \
        abs(float(P[-1]) - drying_ic[-1])


def test_runner_smoke():
    mpp = run_vsfm_sy1991_problem(nz=40, dtime=3600.0, nstep=2,
                                  problem_number=WETTING_PROBLEM)
    P = mpp.get_data(AuxVarKind.INTERNAL, Var.PRESSURE)
    assert P.shape == (40,)
    assert np.all(np.isfinite(P))
