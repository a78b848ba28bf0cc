"""NaN-debug hook (SURVEY §5 sanitizers row): jax_debug_nans behind a
flag/env var, raising at the producing primitive."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mpp_tpu.config import enable_nan_debug, maybe_enable_nan_debug_from_env


def test_debug_nans_traps(monkeypatch):
    enable_nan_debug()
    try:
        with pytest.raises(FloatingPointError):
            jax.jit(lambda x: jnp.log(x) * 0.0 + jnp.sqrt(x))(
                jnp.asarray(-1.0))
    finally:
        enable_nan_debug("disable")


def test_env_hook(monkeypatch):
    monkeypatch.setenv("MPP_DEBUG_NANS", "1")
    try:
        assert maybe_enable_nan_debug_from_env()
        assert jax.config.jax_debug_nans
    finally:
        enable_nan_debug("disable")
    monkeypatch.setenv("MPP_DEBUG_NANS", "0")
    assert not maybe_enable_nan_debug_from_env()


def test_production_step_is_nan_clean_under_trap():
    """The batched VSFM step runs clean with the trap armed — the masked
    satfunc branches do not produce transient NaNs."""
    from mpp_tpu.models import vsfm_batched as vb
    enable_nan_debug()
    try:
        p = vb.ColumnParams.uniform(8, dtype=jnp.float64)
        P0 = jnp.full((4, 8), 3.5355e3)
        bc_top = jnp.full((4,), 9.0e4)
        bc_bot = jnp.full((4,), 3.5355e3)
        P, iters, done = vb.step_dt(P0, 600.0, bc_top, bc_bot, p)
        assert np.all(np.isfinite(np.asarray(P)))
    finally:
        enable_nan_debug("disable")
