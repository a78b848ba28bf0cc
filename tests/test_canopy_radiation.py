"""Regression parity: shortwave, longwave, leafbndlyr suites."""
import os

import pytest

from conftest import REFERENCE_ROOT, reference_available
from mpp_tpu.io.regression import compare_to_baseline, load_suite_tolerances

RT = os.path.join(REFERENCE_ROOT, "regression_tests")


def _run(suite, test_name, runner, writer, tmp_path, num_cells):
    if not reference_available():
        pytest.skip("reference tree not available")
    mpp = runner()
    fname = writer(mpp, str(tmp_path / test_name), num_cells)
    ours = open(fname).read()
    baseline = open(os.path.join(RT, suite,
                                 f"{test_name}.regression.baseline")).read()
    tols = load_suite_tolerances(os.path.join(RT, suite, f"{suite}.cfg"),
                                 test_name)
    failures = compare_to_baseline(ours, baseline, tols)
    assert not failures, "\n".join(failures)


def test_shortwave_regression(tmp_path):
    from mpp_tpu.problems import canopy_radiation as cr
    _run("shortwave", "shortwave", cr.run_shortwave_problem,
         cr.output_regression_shortwave, tmp_path, 6)


def test_longwave_regression(tmp_path):
    from mpp_tpu.problems import canopy_radiation as cr
    _run("longwave", "longwave", cr.run_longwave_problem,
         cr.output_regression_longwave, tmp_path, 6)


def test_leafbndlyr_regression(tmp_path):
    from mpp_tpu.problems import canopy_radiation as cr
    _run("leafbndlyr", "leafbndlyr", cr.run_leafbndlyr_problem,
         cr.output_regression_leafbndlyr, tmp_path, 6)


def test_shortwave_golden_via_compiled(tmp_path):
    """The shortwave golden passes through the compiled jitted
    assemble + batched GMRES+ILU(0) path (compile_radiation)."""
    import functools
    from mpp_tpu.problems import canopy_radiation as cr
    _run("shortwave", "shortwave",
         functools.partial(cr.run_shortwave_problem, use_compiled=True),
         cr.output_regression_shortwave, tmp_path, 6)


def test_longwave_golden_via_compiled(tmp_path):
    import functools
    from mpp_tpu.problems import canopy_radiation as cr
    _run("longwave", "longwave",
         functools.partial(cr.run_longwave_problem, use_compiled=True),
         cr.output_regression_longwave, tmp_path, 6)
