"""MMS verification for VSFM (vsfm_mms_problem.F90 analog).

No golden baseline exists in the reference for this executable; the test
contract is the MMS convergence itself: the discrete solution must
converge to the manufactured pressure field under grid refinement —
2nd order when fully saturated (kr == 1, centered two-point flux is
exact in form), 1st order unsaturated (upwinded mobility).
"""
import numpy as np

from mpp_tpu.problems import vsfm_mms as m


def _orders(errors):
    return [np.log2(errors[i] / errors[i + 1]) for i in range(len(errors) - 1)]


def test_vsfm_mms_fully_saturated_second_order():
    errs = []
    for nx in (20, 40, 80):
        mpp, P_true = m.run_vsfm_mms_problem(nx=nx, fully_saturated=True)
        errs.append(m.pressure_error(mpp, P_true))
    orders = _orders(errs)
    assert errs[-1] < 2.0, errs
    assert all(o > 1.9 for o in orders), (errs, orders)


def test_vsfm_mms_unsaturated_first_order():
    errs = []
    for nx in (20, 40, 80):
        mpp, P_true = m.run_vsfm_mms_problem(nx=nx)
        errs.append(m.pressure_error(mpp, P_true))
    orders = _orders(errs)
    assert errs[-1] < 200.0, errs
    assert all(o > 0.9 for o in orders), (errs, orders)
