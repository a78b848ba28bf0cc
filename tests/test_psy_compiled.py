"""Photosynthesis goldens through the COMPILED batched Newton.

VERDICT r4 item 1: the reference solves photosynthesis by SNES every
ml_model substep (ml_model_problem.F90:403, GoveqnPhotosynthesis.F90:
129-258); the golden configs must pass through the jitted batched path,
not only the serial host iteration.

Tolerance rationale: the serial path carries glibc-libm bit parity (the
FD-Jacobian construction amplifies single transcendental ulps by up to
~1/gs_delta^2, KNOWN_GAPS.md #6); XLA's CPU transcendentals differ by
ulps, so the compiled iterate lands within the stop-criterion's
determinacy band rather than bitwise on the golden.  Measured compiled-
vs-serial deltas (ci, abs): bb/medlyn-c4 ~1e-12..1e-9 (quadratic
convergence -> the root), c3_medlyn/wue ~1e-7, bonan14 ~2e-4 (linear
rate through a ~5%-noise FD map).  The overrides below are ~3x those
measured deltas; physically all are <=1e-6 relative on ci ~ 300.
"""
import os

import pytest

from conftest import REFERENCE_ROOT, reference_available
from mpp_tpu.io.regression import compare_to_baseline, load_suite_tolerances

SUITE = os.path.join(REFERENCE_ROOT, "regression_tests", "photosynthesis")

CASES = [("c3", "ball-berry", "c3_bb", 5e-9),
         ("c4", "ball-berry", "c4_bb", 2e-11),
         ("c3", "medlyn", "c3_medlyn", 3e-7),
         ("c4", "medlyn", "c4_medlyn", 1e-11),
         ("c3", "wue", "c3_wue", 6e-7),
         ("c3", "bonan14", "c3_bonan14", 6e-4)]


@pytest.mark.parametrize("pathway,scm,name,override", CASES)
def test_photosynthesis_compiled_golden(tmp_path, pathway, scm, name,
                                        override):
    if not reference_available():
        pytest.skip("reference tree not available")
    from mpp_tpu.problems import photosynthesis as pp

    mpp = pp.run_photosynthesis_problem(pathway, scm, compiled=True)
    fname = pp.output_regression(mpp, str(tmp_path / name), num_cells=10)
    ours = open(fname).read()
    baseline = open(os.path.join(SUITE,
                                 f"{name}.regression.baseline")).read()
    tols = load_suite_tolerances(os.path.join(SUITE, "photosynthesis.cfg"),
                                 name)
    tols["general"] = (override, "absolute")
    failures = compare_to_baseline(ours, baseline, tols)
    assert not failures, "\n".join(failures)


def test_compiled_psy_surfaces_convergence_and_iters():
    from mpp_tpu.problems import photosynthesis as pp

    mpp = pp.run_photosynthesis_problem("c4", "medlyn", compiled=True)
    assert mpp.soe.cumulative_newton_iterations == 3
