"""Regression parity: photosynthesis suite vs the reference golden
baselines (6 active tests; c4_wue and c4_bonan14 are disabled in the
reference cfg too)."""
import os

import pytest

from conftest import REFERENCE_ROOT, reference_available
from mpp_tpu.io.regression import compare_to_baseline, load_suite_tolerances

SUITE = os.path.join(REFERENCE_ROOT, "regression_tests", "photosynthesis")

# Tolerance overrides (see KNOWN_GAPS.md #6): these configurations
# converge slowly (linear rate, noisy FD Jacobian), so the reference's
# SNES stops with the iterate ~1e-7..1e-6 from the root; the recorded
# iterate has chaotic bit-sensitivity (the FD Jacobian carries ~5%
# rounding noise that any single-ulp difference reshuffles).  We match
# within ~1% of the stop-state's distance to the root.  The fast
# quadratically-converging cases (bb, c4_medlyn) pass at the suite's
# 1e-12.
CASES = [("c3", "ball-berry", "c3_bb", None),
         ("c4", "ball-berry", "c4_bb", None),
         ("c3", "medlyn", "c3_medlyn", 2e-9),
         ("c4", "medlyn", "c4_medlyn", None),
         ("c3", "wue", "c3_wue", 1e-7),
         ("c3", "bonan14", "c3_bonan14", 5e-6)]


@pytest.mark.parametrize("pathway,scm,name,override", CASES)
def test_photosynthesis_regression(tmp_path, pathway, scm, name, override):
    if not reference_available():
        pytest.skip("reference tree not available")
    from mpp_tpu.problems import photosynthesis as pp

    mpp = pp.run_photosynthesis_problem(pathway, scm)
    fname = pp.output_regression(mpp, str(tmp_path / name), num_cells=10)
    ours = open(fname).read()
    baseline = open(os.path.join(SUITE,
                                 f"{name}.regression.baseline")).read()
    tols = load_suite_tolerances(os.path.join(SUITE, "photosynthesis.cfg"),
                                 name)
    if override is not None:
        tols["general"] = (override, "absolute")
    failures = compare_to_baseline(ours, baseline, tols)
    assert not failures, "\n".join(failures)
