"""Tests for the telemetry fragment-merge semantics (reference decoder.hpp:61-115)."""

import math

import pytest

from sondetpu.telemetry import Fields, SondeTelemetry, TelemetryFragment
from sondetpu.physics import altitude_to_pressure, dewpt


def test_empty_fragment_no_fire():
    t = SondeTelemetry()
    assert t.merge(TelemetryFragment()) is False


def test_partial_merge_keeps_other_fields():
    t = SondeTelemetry()
    assert t.merge(TelemetryFragment(fields=Fields.SERIAL, serial="S1234567"))
    assert t.merge(TelemetryFragment(fields=Fields.POS, lat=45.0, lon=9.0, alt=12000.0))
    assert t.serial == "S1234567"
    assert t.lat == 45.0 and t.alt == 12000.0
    # SPEED group untouched
    assert t.spd == 0.0


def test_ptu_merge_computes_dewpt_and_calibrated():
    t = SondeTelemetry()
    t.merge(TelemetryFragment(fields=Fields.PTU, temp=-10.0, rh=80.0,
                              pressure=250.0, calib_percent=100.0))
    assert t.calibrated is True
    assert t.pressure == 250.0
    assert t.dewpt == pytest.approx(dewpt(-10.0, 80.0), rel=1e-6)
    t.merge(TelemetryFragment(fields=Fields.PTU, temp=-10.0, rh=80.0,
                              pressure=250.0, calib_percent=50.0))
    assert t.calibrated is False


def test_pressure_fallback_from_altitude():
    """pressure<=0 triggers the ISA fallback (decoder.hpp:108-110)."""
    t = SondeTelemetry()
    t.merge(TelemetryFragment(fields=Fields.POS | Fields.PTU,
                              lat=1.0, lon=2.0, alt=5000.0,
                              temp=0.0, rh=50.0, pressure=0.0))
    assert t.pressure == pytest.approx(altitude_to_pressure(5000.0), rel=1e-6)


def test_ozone_aux_format():
    t = SondeTelemetry()
    t.merge(TelemetryFragment(fields=Fields.OZONE, o3_mpa=3.14159))
    assert t.aux_data == "O3=3.14mPa"


def test_reset():
    t = SondeTelemetry()
    t.merge(TelemetryFragment(fields=Fields.SERIAL | Fields.SEQ, serial="X", seq=7))
    t.reset()
    assert t.serial == "" and t.seq == 0


def test_isa_model_layers():
    # Sea level ~1013.25 hPa; 11 km boundary ~226.3 hPa; isothermal layer above.
    assert altitude_to_pressure(0.0) == pytest.approx(1013.25, rel=1e-4)
    assert altitude_to_pressure(11000.0) == pytest.approx(226.32, rel=1e-3)
    assert altitude_to_pressure(15000.0) == pytest.approx(121.0, rel=0.02)
    # Negative altitude uses layer 0; very high altitude uses the top layer.
    assert altitude_to_pressure(-100.0) > altitude_to_pressure(0.0)
    assert altitude_to_pressure(80000.0) == pytest.approx(0.0244, rel=0.02)


def test_isa_jnp_matches_scalar():
    import numpy as np
    from sondetpu.physics import altitude_to_pressure_jnp

    alts = np.array([-50.0, 0.0, 5000.0, 11000.0, 25000.0, 40000.0, 60000.0, 80000.0])
    got = np.asarray(altitude_to_pressure_jnp(alts))
    want = np.array([altitude_to_pressure(a) for a in alts])
    np.testing.assert_allclose(got, want, rtol=2e-5)


def test_dewpt_jnp_matches_scalar():
    import numpy as np
    from sondetpu.physics import dewpt_jnp

    got = float(dewpt_jnp(20.0, 60.0))
    # float32 on device vs float64 host math
    assert got == pytest.approx(dewpt(20.0, 60.0), rel=1e-3)


def test_isa_pressure_tracks_altitude_on_pos_only_updates():
    """While the pressure is ISA-derived (no sensor), POS-only fragments
    must recompute it — not freeze it at the first altitude."""
    from sondetpu.telemetry import Fields, SondeTelemetry, TelemetryFragment

    t = SondeTelemetry()
    f1 = TelemetryFragment(fields=Fields.POS | Fields.PTU,
                           lat=45.0, lon=9.0, alt=1000.0,
                           temp=-5.0, rh=50.0, pressure=0.0)
    t.merge(f1)
    p_low = t.pressure
    f2 = TelemetryFragment(fields=Fields.POS, lat=45.0, lon=9.0, alt=8000.0)
    t.merge(f2)
    assert t.pressure < p_low * 0.6         # climbed 7 km: pressure fell
    # a real sensor value stops the fallback
    f3 = TelemetryFragment(fields=Fields.PTU, temp=-30.0, rh=10.0,
                           pressure=355.0)
    t.merge(f3)
    f4 = TelemetryFragment(fields=Fields.POS, lat=45.0, lon=9.0, alt=9000.0)
    t.merge(f4)
    assert t.pressure == 355.0


def test_geo_calendar_roundtrip():
    """Civil-date helpers (ims100 date words, c50 date telegrams, imet4
    replay): epoch <-> (y, m, d, sod) round-trips exactly, including leap
    days and year boundaries."""
    import time as _t

    from sondetpu.sondes.geo import utc_to_ymd_sod, ymd_sod_to_utc

    for t in (0.0, 951867072.0, 1.7e9, 1709164800.0,   # 2024-02-29
              1704067199.0, 1704067200.0):             # year boundary
        y, m, d, sod = utc_to_ymd_sod(t)
        assert abs(ymd_sod_to_utc(y, m, d, sod) - t) < 1e-6
        ref = _t.gmtime(t)
        assert (y, m, d) == (ref.tm_year, ref.tm_mon, ref.tm_mday)
        assert abs(sod - (ref.tm_hour * 3600 + ref.tm_min * 60
                          + ref.tm_sec)) < 1.0
