"""vsfm_spac_mms: MMS verification of the 3-GE SPAC network.

No reference golden exists; the check is the MMS contract itself —
the solved pressures converge to the manufactured solution under grid
refinement at ~2nd order in each subdomain.
"""
import numpy as np
import pytest

from mpp_tpu.problems.vsfm_spac_mms import (pressure_errors,
                                            run_vsfm_spac_mms_problem)


@pytest.fixture(scope="module")
def coarse_fine():
    out = {}
    for gf in (1, 2):
        mpp, truths = run_vsfm_spac_mms_problem(grid_factor=gf)
        out[gf] = pressure_errors(mpp, truths)
    return out


def test_errors_small(coarse_fine):
    """At grid_factor=2 every subdomain is within a few Pa of the
    manufactured pressure (fields span ~4000 Pa)."""
    e_soil, e_root, e_xylm = coarse_fine[2]
    assert e_soil < 5.0
    assert e_root < 20.0
    assert e_xylm < 20.0


def test_convergence_order(coarse_fine):
    """Halving dx must cut the max pressure error ~4x (2nd order)."""
    for c, f in zip(coarse_fine[1], coarse_fine[2]):
        order = np.log2(c / f)
        assert order > 1.5, (c, f, order)
