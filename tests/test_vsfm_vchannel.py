"""Regression parity: vsfm_vchannel vs the reference golden baseline."""
import os

import pytest

from conftest import REFERENCE_ROOT, reference_available
from mpp_tpu.io.regression import compare_to_baseline, load_suite_tolerances

SUITE = os.path.join(REFERENCE_ROOT, "regression_tests", "vsfm")


def test_vsfm_vchannel_regression(tmp_path):
    if not reference_available():
        pytest.skip("reference tree not available")
    from mpp_tpu.problems import vsfm_vchannel as prob

    mpp = prob.run_vsfm_vchannel_problem()
    base = str(tmp_path / "vsfm_vchannel")
    fname = prob.output_regression(mpp, base, num_cells=5)
    ours = open(fname).read()
    baseline = open(os.path.join(
        SUITE, "vsfm_vchannel.regression.baseline")).read()
    tols = load_suite_tolerances(os.path.join(SUITE, "vsfm.cfg"),
                                 "vsfm_vchannel")
    failures = compare_to_baseline(ours, baseline, tols)
    assert not failures, "\n".join(failures)
