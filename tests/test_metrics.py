"""Structured per-step metrics stream (SURVEY §5 metrics row)."""
import json

import numpy as np

from mpp_tpu.io.metrics import MetricsStream
from mpp_tpu.problems.vsfm_manoli2014 import build_vsfm_manoli2014


def test_vsfm_step_metrics(tmp_path):
    path = tmp_path / "metrics.jsonl"
    stream = MetricsStream(str(path))
    mpp = build_vsfm_manoli2014()
    mpp.soe.metrics = stream
    for istep in range(1, 3):
        ok, _ = mpp.soe.step_dt(8640.0, istep)
        assert ok

    assert len(stream.records) == 2
    r = stream.last()
    assert r["converged"] and r["reason"] > 0
    assert r["newton_iterations"] >= 1
    assert r["dt_cuts"] == 0
    assert np.isfinite(r["fnorm"])

    totals = stream.totals()
    assert totals["steps"] == 2
    assert totals["newton_iterations"] >= 2
    stream.close()

    lines = [json.loads(ln) for ln in path.read_text().splitlines()]
    assert len(lines) == 2
    assert lines[0]["step"] == 1


def test_all_soes_emit_metrics():
    """VERDICT r2 item 8: every SoE emits step records through the shared
    MetricsStream (thermal KSP, thermal-enthalpy, TH, TH-SPAC network,
    MLC, photosynthesis, radiation KSP, LBL)."""
    from mpp_tpu.problems.thermal_mms import run_thermal_mms_problem
    from mpp_tpu.problems.th import run_heat_transport_1d, run_mass_and_heat
    from mpp_tpu.problems.photosynthesis import run_photosynthesis_problem
    from mpp_tpu.problems.canopy_radiation import (run_shortwave_problem,
                                                   run_leafbndlyr_problem)
    from mpp_tpu.problems.mlc import run_mlc_problem
    from mpp_tpu.problems.th_manoli2014 import build_th_manoli2014

    cases = [
        ("thermal_ksp", lambda: run_thermal_mms_problem()[0], 1.0),
        ("thermal_enthalpy",
         lambda: run_heat_transport_1d(nstep=1)[0], 3600.0),
        ("th_newton", lambda: run_mass_and_heat(nx=20)[0], 3600.0),
        ("th_spac", lambda: build_th_manoli2014(), 8640.0),
        ("mlc", lambda: run_mlc_problem(), 300.0),
        ("photosynthesis",
         lambda: run_photosynthesis_problem("c3", "ball-berry"), 1800.0),
        ("shortwave", lambda: run_shortwave_problem(), 0.0),
        ("lbl", lambda: run_leafbndlyr_problem(), 0.0),
    ]
    for name, build, dt in cases:
        mpp = build()
        stream = MetricsStream()
        mpp.soe.metrics = stream
        out = mpp.soe.step_dt(dt)
        ok = out[0] if isinstance(out, tuple) else out
        assert ok, name
        assert len(stream.records) == 1, name
        rec = stream.last()
        assert rec["converged"], name
        assert rec["dt"] == dt, name
