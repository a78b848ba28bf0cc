"""vsfm_wt_dynamics: water-table rise under constant rain.

No reference golden exists; asserts the driver's physics — the water
table (P = PRESSURE_REF crossing) rises monotonically under recharge.
"""
import numpy as np

from mpp_tpu.constants import AuxVarKind, Var, PRESSURE_REF
from mpp_tpu.problems.vsfm_wt_dynamics import run_vsfm_wt_dynamics_problem


def _water_table_depth(P, z_column=1.0):
    """Depth below surface of the P=Pref crossing (cells ordered bottom
    to top for the IN_Z_DIR structured mesh)."""
    nz = P.size
    dz = z_column / nz
    zc = dz / 2.0 + dz * np.arange(nz)       # height above column base
    above = P - PRESSURE_REF
    idx = np.where(above <= 0.0)[0]
    if idx.size == 0:
        return 0.0
    k = idx[0]                               # first unsaturated cell
    if k == 0:
        return z_column
    # linear interpolation between cell k-1 (sat) and k (unsat)
    frac = above[k - 1] / (above[k - 1] - above[k])
    z_wt = zc[k - 1] + frac * dz
    return z_column - z_wt


def test_water_table_rises():
    mpp = run_vsfm_wt_dynamics_problem(nz=100, dtime=3600.0, nstep=6)
    P0 = np.asarray(mpp.press_ic if hasattr(mpp, "press_ic") else [])
    P = np.asarray(mpp.get_data(AuxVarKind.INTERNAL, Var.PRESSURE))
    d_end = _water_table_depth(P)
    # IC put the water table at 0.5 m depth; 6 h of 2.5e-5 m/s rain into
    # porosity 0.368 must raise it measurably (but not to the surface)
    assert d_end < 0.5 - 0.05
    assert d_end > 0.0
    # deep cells stay hydrostatic-saturated: bottom pressure > Pref
    assert P[0] > PRESSURE_REF


def test_saturation_profile_monotone():
    mpp = run_vsfm_wt_dynamics_problem(nz=50, dtime=3600.0, nstep=2)
    s = np.asarray(mpp.get_data(AuxVarKind.INTERNAL, Var.LIQ_SAT))
    # saturated at depth, drier upward; monotone non-increasing with z
    assert s[0] > 0.999
    assert np.all(np.diff(s) <= 1e-12)
