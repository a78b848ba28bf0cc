"""Batched end-to-end canopy pipeline (lwv -> lbl -> psy -> mlc) — the
TPU production path for the ml_model substep loop.  Physics-envelope
tests: the fully-jitted substep must converge to a physical canopy state
and be batch-consistent (every identical column produces the identical
answer)."""
import jax
import numpy as np
import pytest

from mpp_tpu.batched.canopy_pipeline import CanopyPipeline


@pytest.fixture(scope="module")
def pipe():
    return CanopyPipeline(ncair=4)


def test_substep_physical_envelope(pipe):
    state = pipe.initial_state()
    step = jax.jit(lambda s: pipe.substep(s))
    for _ in range(6):
        state = step(state)
    T_air = np.asarray(state.T_air)
    q_air = np.asarray(state.q_air)
    T_sun = np.asarray(state.T_sun)
    dpai_pos = np.asarray(pipe.dpai_pos)

    assert np.isfinite(T_air).all() and np.isfinite(q_air).all()
    # canopy air within a plausible band around the 295.9 K forcing
    assert (T_air > 270.0).all() and (T_air < 320.0).all()
    # specific humidity physical
    assert (q_air >= 0.0).all() and (q_air < 0.05).all()
    # sunlit leaves warmer than shaded at midday forcing (absorbed SW)
    T_shd = np.asarray(state.T_shd)
    assert (T_sun[:, dpai_pos] >= T_shd[:, dpai_pos] - 0.5).all()

    # batch consistency: all identical columns identical
    for arr in (T_air, q_air, T_sun, T_shd):
        assert np.abs(arr - arr[:1]).max() <= 1e-12


def test_substep_approaches_steady_state(pipe):
    state = pipe.initial_state()
    step = jax.jit(lambda s: pipe.substep(s))
    prev = None
    for _ in range(12):
        prev = state
        state = step(state)
    d = float(np.abs(np.asarray(state.T_air) - np.asarray(prev.T_air)).max())
    assert d < 0.5, f"canopy not settling (|dT| {d} K/substep)"
