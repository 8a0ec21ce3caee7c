"""Host-speed calibration channel (bench credibility, r9).

The r8 bench's load-average gate certified an "idle" host that was
delivering ~25% less CPU; these pins keep the replacement honest:
calibration numbers are measured (not inferred), the recorded best
only ratchets down, and a degraded host is flagged by the worst
per-kernel ratio."""

import json

from xmidt_event_streams_spark import calibration as C


def test_numpy_kernel_measures():
    # no wall-clock ratio pins here -- the suite itself runs under
    # load (that lesson is the whole reason this module exists); we
    # pin only that it measures real, finite work
    a = C.numpy_kernel_ms(reps=2)
    assert 0 < a < 60_000


def test_record_best_ratchets_down(tmp_path, monkeypatch):
    f = tmp_path / "CALIBRATION.json"
    monkeypatch.setattr(C, "CALIBRATION_FILE", f)
    C.record_best({"numpy_ms": 100.0, "spark_ms": 200.0})
    C.record_best({"numpy_ms": 150.0, "spark_ms": 120.0})  # mixed
    best = json.loads(f.read_text())
    assert best == {"numpy_ms": 100.0, "spark_ms": 120.0}


def test_degraded_flag_vs_recorded_best(tmp_path, monkeypatch):
    f = tmp_path / "CALIBRATION.json"
    monkeypatch.setattr(C, "CALIBRATION_FILE", f)
    real = C.numpy_kernel_ms(reps=2)
    # best-known is an impossibly fast host -> this run must flag
    C.record_best({"numpy_ms": real / 10, "spark_ms": 1.0})
    cal = C.host_calibration(spark=None)  # numpy kernel only
    assert cal["factor"] > C.DEGRADED_FACTOR
    assert cal["host_degraded"] is True
    # and against a best it can actually meet, it must NOT flag
    f.unlink()
    C.record_best({"numpy_ms": real * 2})
    cal = C.host_calibration(spark=None)
    assert cal["host_degraded"] is False


def test_no_recorded_best_seeds_factor_one(tmp_path, monkeypatch):
    monkeypatch.setattr(C, "CALIBRATION_FILE", tmp_path / "none.json")
    cal = C.host_calibration(spark=None)
    assert cal["factor"] == 1.0 and cal["host_degraded"] is False
