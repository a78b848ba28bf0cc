"""Porosity models (constant, linear compressibility).

Vectorized reimplementation of ``src/mpp/util/PorosityFunctionMod.F90``.
Per-cell model selection is static numpy configuration.
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

POROSITY_CONSTANT = 1
POROSITY_LINEAR = 2


@dataclasses.dataclass
class PorosityParams:
    """SoA of ``porosity_params_type`` (PorosityFunctionMod.F90:20-31)."""
    porosity_id: np.ndarray       # static model codes
    porosity_base: jnp.ndarray
    pressure_reference: jnp.ndarray
    lin_mod_slope: jnp.ndarray

    @staticmethod
    def constant(base):
        base = np.asarray(base, dtype=np.float64)
        return PorosityParams(
            porosity_id=np.full(base.shape, POROSITY_CONSTANT, np.int32),
            porosity_base=base,
            pressure_reference=np.zeros_like(base),
            lin_mod_slope=np.zeros_like(base))

    @staticmethod
    def linear(base, press_base, slope):
        base = np.asarray(base, dtype=np.float64)
        return PorosityParams(
            porosity_id=np.full(base.shape, POROSITY_LINEAR, np.int32),
            porosity_base=base,
            pressure_reference=np.broadcast_to(press_base, base.shape).copy(),
            lin_mod_slope=np.broadcast_to(slope, base.shape).copy())


def porosity(params: PorosityParams, P):
    """(por, dpor/dP) (PorosityFunctionMod.F90:98-162)."""
    is_linear = jnp.asarray(params.porosity_id == POROSITY_LINEAR)
    por_lin = params.porosity_base + (P - params.pressure_reference) * params.lin_mod_slope
    por = jnp.where(is_linear, por_lin, params.porosity_base + 0.0 * P)
    dpor = jnp.where(is_linear, params.lin_mod_slope, 0.0)
    return por, dpor
