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
