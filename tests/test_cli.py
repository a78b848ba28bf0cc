"""Namelist dispatcher: drive problems through the standalone_mpp-style
CLI using the reference's own .namelist files, diff against its goldens."""
import os
import shutil

import pytest

from conftest import REFERENCE_ROOT, reference_available
from mpp_tpu.cli import main
from mpp_tpu.io.regression import compare_to_baseline, load_suite_tolerances

RT = os.path.join(REFERENCE_ROOT, "regression_tests")


@pytest.mark.parametrize("suite,test,category_tols", [
    ("thermal", "thermal_mms", {}),
    ("thermal", "thermal_mms_2d", {}),
    ("vsfm", "vsfm_celia1990", {}),
    ("longwave", "longwave", {}),
])
def test_cli_dispatch_matches_goldens(tmp_path, suite, test, category_tols,
                                      monkeypatch):
    if not reference_available():
        pytest.skip("reference tree not available")
    src = os.path.join(RT, suite, test + ".namelist")
    dst = str(tmp_path / (test + ".namelist"))
    shutil.copy(src, dst)
    monkeypatch.chdir(tmp_path)
    assert main(["-namelist", dst]) == 0
    ours = open(str(tmp_path / (test + ".regression"))).read()
    baseline = open(os.path.join(RT, suite,
                                 test + ".regression.baseline")).read()
    tols = load_suite_tolerances(os.path.join(RT, suite, suite + ".cfg"),
                                 test)
    tols.update(category_tols)
    failures = compare_to_baseline(ours, baseline, tols)
    assert not failures, "\n".join(failures)


def test_cli_requires_namelist(capsys):
    with pytest.raises(SystemExit):
        main([])


def test_cli_unknown_problem(tmp_path):
    nl = tmp_path / "bogus.namelist"
    nl.write_text("&mpp_driver\n  problem_type = 'bogus'\n/\n")
    with pytest.raises(SystemExit):
        main(["-namelist", str(nl)])
