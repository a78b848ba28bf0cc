"""FETCH2 single-tree xylem problem: end-to-end exercise of the FETCH2
saturation curve + Weibull vulnerability relperm + FETCH2 transpiration
downregulation (VERDICT r1 item 7; no reference golden ships — the
reference driver needs unshipped binary forcing — so physics is
asserted: tension profile, water-content bounds, downregulation,
steady-state convergence)."""
import numpy as np
import jax.numpy as jnp
import pytest

from mpp_tpu.problems.vsfm_spac_fetch2 import (run_vsfm_spac_fetch2_problem,
                                               SPECIES)
from mpp_tpu.ops import satfunc as sf


@pytest.mark.parametrize("species", ["es", "oak"])
def test_fetch2_tree_physics(species):
    mpp = run_vsfm_spac_fetch2_problem(species, nstep=3)
    ge = mpp.soe.goveqns[0]
    p = SPECIES[species]
    P = np.asarray(mpp.soe.soln)
    nz = p["nz"]

    # transpiration pull: tension increases toward the crown (cell 0 =
    # top), monotonically through the conductive column
    assert P[0] < P[-1]
    assert np.all(np.diff(P) > 0)

    # FETCH2 water content and Weibull conductivity stay physical
    sat, _ = sf.press_to_sat(ge.sat_params, jnp.asarray(P))
    kr, _ = sf.press_to_relperm(ge.sat_params, jnp.asarray(P), 1.0)
    sat = np.asarray(sat)
    kr = np.asarray(kr)
    assert np.all((sat > 0.0) & (sat <= 1.0))
    assert np.all((kr > 0.0) & (kr <= 1.0))
    # the crown is under more tension -> drier, less conductive
    assert sat[0] < sat[-1]
    assert kr[0] <= kr[-1]

    # FETCH2 downregulation engages where tension is high:
    # factor = exp(-((P-Pref)/phis50)^c3) < 1 at the crown
    dP = P[0] - 101325.0
    factor_top = np.exp(-((dP / p["phis50"]) ** p["c3"]))
    assert 0.0 < factor_top <= 1.0


def test_fetch2_tree_approaches_steady_state():
    """The capacitive xylem column relaxes geometrically toward steady
    state under constant demand (measured decay ratio ~0.915/step at
    dt=1800 s)."""
    mpp = run_vsfm_spac_fetch2_problem("es", nstep=1, dtime=1800.0)
    P_prev = np.asarray(mpp.soe.soln).copy()
    deltas = []
    for istep in range(2, 32):
        ok, _ = mpp.soe.step_dt(1800.0, istep)
        assert ok
        P = np.asarray(mpp.soe.soln)
        deltas.append(np.abs(P - P_prev).max())
        P_prev = P.copy()
    deltas = np.asarray(deltas)
    # monotone geometric decay, overall at least 5x down over 30 steps
    assert np.all(np.diff(deltas) < 0.0)
    assert deltas[-1] < 0.2 * deltas[0]
