"""Regression parity: thermal MMS suite vs the reference golden baselines.

Compares our produced .regression output against
``/root/reference/regression_tests/thermal/*.regression.baseline`` under
the tolerances in ``thermal.cfg`` (temperature 1e-8 absolute).
"""
import os

import numpy as np
import pytest

from conftest import REFERENCE_ROOT, reference_available
from mpp_tpu.io.regression import (RegressionWriter, compare_to_baseline,
                                   load_suite_tolerances, parse_regression,
                                   format_e21_13)

SUITE = os.path.join(REFERENCE_ROOT, "regression_tests", "thermal")


def test_format_e21_13():
    assert format_e21_13(270.7677262973) == "  0.2707677262973E+03"
    assert format_e21_13(-270.7677262973) == " -0.2707677262973E+03"
    assert format_e21_13(0.0) == "  0.0000000000000E+00"
    assert format_e21_13(1e-60) == "  0.0000000000000E+00"
    assert format_e21_13(9.99999999999999e-1) == "  0.1000000000000E+01"


@pytest.mark.parametrize("ptype,name", [(1, "thermal_mms"),
                                        (2, "thermal_mms_2d"),
                                        (3, "thermal_mms_3d")])
def test_thermal_mms_regression(tmp_path, ptype, name):
    if not reference_available():
        pytest.skip("reference tree not available")
    from mpp_tpu.problems import thermal_mms as tm
    from mpp_tpu.config import read_namelist

    nml = read_namelist(os.path.join(SUITE, f"{name}.namelist"))
    opts = nml.get("problem_options", {})
    num_cells = nml["regression_test"]["num_cells"]
    mpp, soln = tm.run_thermal_mms_problem(
        ptype, nx=opts.get("nx"), ny=opts.get("ny"), nz=opts.get("nz"))
    base = str(tmp_path / name)
    fname = tm.output_regression(base, num_cells=num_cells, soln=soln)
    ours = open(fname).read()
    baseline = open(os.path.join(SUITE, f"{name}.regression.baseline")).read()
    tols = load_suite_tolerances(os.path.join(SUITE, "thermal.cfg"), name)
    failures = compare_to_baseline(ours, baseline, tols)
    assert not failures, "\n".join(failures)
