"""Regression parity: vsfm_spac vs the reference golden baseline."""
import os

import pytest

from conftest import REFERENCE_ROOT, reference_available
from mpp_tpu.io.regression import compare_to_baseline, load_suite_tolerances

SUITE = os.path.join(REFERENCE_ROOT, "regression_tests", "vsfm")


def test_vsfm_spac_regression(tmp_path):
    if not reference_available():
        pytest.skip("reference tree not available")
    from mpp_tpu.problems import vsfm_spac as prob

    mpp = prob.run_vsfm_spac_problem()
    base = str(tmp_path / "vsfm_spac")
    fname = prob.output_regression(mpp, base, num_cells=5)
    ours = open(fname).read()
    baseline = open(os.path.join(
        SUITE, "vsfm_spac.regression.baseline")).read()
    tols = load_suite_tolerances(os.path.join(SUITE, "vsfm.cfg"), "vsfm_spac")
    # ROOT-CAUSED (KNOWN_GAPS.md #1): the leaf/hub rows have a tiny
    # diagonal (den*RL ~ 1.9e-5 kmol/s/Pa), so the solution's position
    # along that direction is 4.2e7 Pa per unit residual — the golden is
    # a PETSc SNES iterate stopped at ||F|| <~ fnorm0*rtol ~ 4e-16
    # kmol/s, which leaves up to ~5e-8 Pa of legitimate slack in the
    # leaf cell (the implied residual at the golden is 7.9e-16 kmol/s;
    # root cells shift < 2e-13 Pa and match at full tolerance).  The
    # 5e-8 abs relaxation equals the golden's own determinacy radius;
    # test_leaf_row_conditioning below pins the analysis.
    tols["pressure"] = (5e-8, "absolute")
    tols["general"] = (5e-13, "absolute")
    failures = compare_to_baseline(ours, baseline, tols)
    assert not failures, "\n".join(failures)


def test_leaf_row_conditioning():
    """Root-cause pin for the 3.3e-8 Pa leaf deviation: the leaf/hub
    rows of the SPAC Jacobian are near-singular (conductance RL between
    two zero-storage cells), so the golden SNES iterate's stop leaves
    O(1e-15) kmol/s residual there = O(1e-8) Pa of leaf slack, while
    every sampled root cell stays pinned to <2e-13 Pa."""
    import jax.numpy as jnp
    import numpy as np
    from mpp_tpu.problems.vsfm_spac import run_vsfm_spac_problem

    mpp = run_vsfm_spac_problem()
    ge = mpp.soe.goveqns[0]
    P = np.asarray(mpp.soe.soln)

    r, c = ge.coo_coords()
    vals = np.asarray(ge.jacobian_values(jnp.asarray(P), 3600.0))
    n = ge.mesh.ncells_local
    J = np.zeros((n, n))
    np.add.at(J, (r[:vals.size], c[:vals.size]), vals)
    s = np.linalg.inv(J)[:, 0]      # solution shift per unit leaf residual

    # leaf/hub move together at ~4e7 Pa/(kmol/s); roots are 1e5x stiffer
    assert 1e7 < s[0] < 1e8
    assert abs(s[1] / s[0] - 1.0) < 0.01
    assert np.abs(s[2:]).max() < 1e-4 * s[0]

    # the observed 3.3e-8 Pa deviation corresponds to a residual at the
    # golden far below any SNES stopping resolution
    implied_residual = 3.3e-8 / s[0]
    assert implied_residual < 1e-14   # kmol/s
