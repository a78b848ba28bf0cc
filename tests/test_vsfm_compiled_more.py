"""Compiled-path coverage beyond the golden suites: recharge source
problems, water-table dynamics, and the manoli2014 coupled 3-GE SPAC
network run through the compiled batched stepper and compared against
the serial SNES trajectory (both paths share assembly AND the PETSc
GMRES+ILU(0) inner-solve replication, so agreement is tight)."""
import numpy as np
import pytest

from mpp_tpu.constants import AuxVarKind, Var


@pytest.mark.parametrize("name", ["sy1991", "wt_dynamics", "manoli2014"])
def test_compiled_matches_serial_trajectory(name):
    if name == "sy1991":
        from mpp_tpu.problems.vsfm_sy1991 import run_vsfm_sy1991_problem
        run = lambda c: run_vsfm_sy1991_problem(nz=50, nstep=4,
                                                use_compiled=c)
        tol = 1e-5
    elif name == "wt_dynamics":
        from mpp_tpu.problems.vsfm_wt_dynamics import (
            run_vsfm_wt_dynamics_problem)
        run = lambda c: run_vsfm_wt_dynamics_problem(nstep=4, use_compiled=c)
        tol = 1e-5
    else:
        from mpp_tpu.problems.vsfm_manoli2014 import (
            run_vsfm_manoli2014_problem)
        run = lambda c: run_vsfm_manoli2014_problem(use_compiled=c)
        # coupled-network iterates carry ~|F|/g determinacy slack
        tol = 1e-3

    m_ser = run(False)
    m_cmp = run(True)
    p_ser = m_ser.get_data(AuxVarKind.INTERNAL, Var.PRESSURE)
    p_cmp = m_cmp.get_data(AuxVarKind.INTERNAL, Var.PRESSURE)
    err = np.abs(p_ser - p_cmp).max()
    assert err < tol, (name, err)
    # both produced a nontrivial state
    assert np.abs(p_ser - p_ser[0]).max() > 1.0


def test_compiled_fetch2_and_mms():
    """FETCH2 saturation/relperm + downregulated sinks, and the MMS
    heterogeneous-permeability TGDPB01 problem, through the compiled
    path."""
    from mpp_tpu.problems.vsfm_spac_fetch2 import (
        run_vsfm_spac_fetch2_problem)
    from mpp_tpu.problems.vsfm_mms import (run_vsfm_mms_problem,
                                           pressure_error)

    m_ser = run_vsfm_spac_fetch2_problem()
    m_cmp = run_vsfm_spac_fetch2_problem(use_compiled=True)
    p_ser = m_ser.get_data(AuxVarKind.INTERNAL, Var.PRESSURE)
    p_cmp = m_cmp.get_data(AuxVarKind.INTERNAL, Var.PRESSURE)
    assert np.abs(p_ser - p_cmp).max() < 1e-3

    # compiled MMS solve matches the serial one to solver precision
    m_ser2, P_true = run_vsfm_mms_problem(nx=20)
    m_cmp2, _ = run_vsfm_mms_problem(nx=20, use_compiled=True)
    e_ser = pressure_error(m_ser2, P_true)
    e_cmp = pressure_error(m_cmp2, P_true)
    assert abs(e_ser - e_cmp) < 1e-8 * max(e_ser, 1.0)
