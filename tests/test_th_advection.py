"""heat_transport_1D_with_advection: enthalpy transport with Darcy flow.

No reference golden exists (the reference driver needs an unshipped
pressure_ic.bin); asserts the advective physics: with a pressure
gradient, the temperature front is displaced downstream relative to the
pure-conduction solution.
"""
import numpy as np

from mpp_tpu.problems.th import run_heat_transport_1d_with_advection

NX = 50


def test_uniform_pressure_conduction_profile():
    """With uniform pressure there is no advection: both Dirichlet faces
    (303.15 / 293.15 K) warm into the 283.15 K interior, which stays
    coldest in the middle after one hour."""
    _, T = run_heat_transport_1d_with_advection(nx=NX, dtime=3600.0,
                                                nstep=1)
    T = np.asarray(T)
    assert T.shape == (NX,)
    mid = NX // 2
    assert T[0] > T[mid] < T[-1]
    assert np.all(np.diff(T[:mid]) <= 1e-10)      # cooling away from hot face
    assert np.all(np.diff(T[-mid:]) >= -1e-10)    # warming toward cold face
    assert T.min() >= 283.15 - 1e-8


def test_advection_direction():
    """A 4000 Pa pressure drop advects face water downstream: with the
    drop left->right the hot (303 K) face warms the left interior; with
    the drop reversed the cold-side (293 K) face water sweeps the right
    interior instead, and the left sees much less warming."""
    _, T0 = run_heat_transport_1d_with_advection(nx=NX, dtime=3600.0,
                                                 nstep=2)
    fwd = np.linspace(95325.0, 91325.0, NX)
    _, T1 = run_heat_transport_1d_with_advection(nx=NX, dtime=3600.0,
                                                 nstep=2, pressure_ic=fwd)
    rev = fwd[::-1].copy()
    _, T2 = run_heat_transport_1d_with_advection(nx=NX, dtime=3600.0,
                                                 nstep=2, pressure_ic=rev)
    T0, T1, T2 = np.asarray(T0), np.asarray(T1), np.asarray(T2)
    third = NX // 3
    d_fwd = T1 - T0
    d_rev = T2 - T0
    assert T1.mean() > T0.mean() + 0.01
    assert d_fwd[2:third].min() > 0.01              # hot-face water inward
    # downstream asymmetry: reversed flow warms the right side most and
    # barely touches the left
    assert d_rev[-third:-2].max() > 3.0 * d_rev[2:third].max()
    assert d_fwd[2:third].min() > d_rev[2:third].max()
