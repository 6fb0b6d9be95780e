"""Tests for GPX/PTU/JSONL sinks (reference gpx.cpp / ptu.cpp semantics)."""

import json
import xml.etree.ElementTree as ET

from sondetpu.io import GPXWriter, JSONLWriter, PTUWriter
from sondetpu.telemetry import Fields, SondeTelemetry, TelemetryFragment


def _parse(path):
    return ET.parse(path).getroot()


NS = "{http://www.topografix.com/GPX/1/1}"


def test_gpx_always_valid_xml(tmp_path):
    p = tmp_path / "t.gpx"
    w = GPXWriter(str(p))
    _parse(p)  # valid right after init
    w.start_track("SONDE1")
    _parse(p)  # valid mid-track
    w.add_track_point(1700000000, 45.0, 9.0, 1000.0, 10.0, 90.0)
    root = _parse(p)
    trk = root.find(f"{NS}trk")
    assert trk is not None
    assert trk.find(f"{NS}name").text == "SONDE1"
    pts = trk.find(f"{NS}trkseg").findall(f"{NS}trkpt")
    assert len(pts) == 1
    assert pts[0].get("lat").startswith("45.0")
    # even without deinit the file is terminated; deinit keeps it valid
    w.deinit()
    _parse(p)


def test_gpx_point_dedup_rules(tmp_path):
    p = tmp_path / "t.gpx"
    w = GPXWriter(str(p))
    w.start_track("S")
    w.add_track_point(100, 1.0, 2.0, 3.0, 0, 0)
    w.add_track_point(100, 5.0, 6.0, 7.0, 0, 0)      # same time -> dropped
    w.add_track_point(101, 1.0, 2.0, 3.0, 0, 0)      # same pos  -> dropped
    w.add_track_point(102, 0.0, 0.0, 0.0, 0, 0)      # all-zero  -> dropped
    w.add_track_point(103, float("nan"), 2.0, 3.0, 0, 0)  # NaN -> dropped
    w.add_track_point(104, 1.1, 2.0, 3.0, 0, 0)      # kept
    w.deinit()
    pts = _parse(p).find(f"{NS}trk").find(f"{NS}trkseg").findall(f"{NS}trkpt")
    assert len(pts) == 2


def test_gpx_track_per_serial(tmp_path):
    p = tmp_path / "t.gpx"
    w = GPXWriter(str(p))
    w.start_track("A1")
    w.add_track_point(1, 1.0, 1.0, 1.0, 0, 0)
    w.start_track("A1")  # same serial: no-op
    w.add_track_point(2, 1.5, 1.0, 1.0, 0, 0)
    w.start_track("B2")  # new serial: closes A1, opens B2
    w.add_track_point(3, 2.0, 2.0, 2.0, 0, 0)
    w.deinit()
    trks = _parse(p).findall(f"{NS}trk")
    assert [t.find(f"{NS}name").text for t in trks] == ["A1", "B2"]
    assert len(trks[0].find(f"{NS}trkseg").findall(f"{NS}trkpt")) == 2
    assert len(trks[1].find(f"{NS}trkseg").findall(f"{NS}trkpt")) == 1


def test_gpx_rejects_nongraphic_serial(tmp_path):
    p = tmp_path / "t.gpx"
    w = GPXWriter(str(p))
    w.start_track("BAD NAME")   # contains a space -> rejected (gpx.cpp:43)
    w.add_track_point(1, 1.0, 1.0, 1.0, 0, 0)  # no active track -> dropped
    w.deinit()
    assert _parse(p).find(f"{NS}trk") is None


def test_ptu_csv_schema(tmp_path):
    p = tmp_path / "t.csv"
    w = PTUWriter(str(p))
    t = SondeTelemetry()
    t.merge(TelemetryFragment(
        fields=Fields.POS | Fields.PTU | Fields.TIME | Fields.OZONE,
        lat=45.123456, lon=9.5, alt=1000.0, temp=-5.3, rh=42.0,
        pressure=800.0, time=1700000000.0, o3_mpa=1.5))
    w.add_point(t)
    w.deinit()
    lines = p.read_text().splitlines()
    assert lines[0] == ("Epoch,Temperature,Relative humidity,Dew point,Pressure,"
                        "Latitude,Longitude,Altitude,Speed,Heading,Climb,XDATA")
    cols = lines[1].split(",")
    assert cols[0] == "1700000000"
    assert cols[1] == "-5.3"
    assert cols[5] == "45.123456"
    assert cols[11] == "O3=1.50mPa"


def test_table_render_uncal_styling():
    """Live table mirrors the reference GUI semantics (main.cpp:155-297):
    uncalibrated PTU values yellow with the calib percentage; N/S and E/W
    hemisphere suffixes; burstkill/aux columns present."""
    from sondetpu.io.table import render_table
    from sondetpu.telemetry import SondeTelemetry

    t = SondeTelemetry(serial="T1", seq=7, lat=-12.5, lon=-45.25, alt=8000.0,
                       temp=-10.0, rh=50.0, dewpt=-18.0, pressure=350.0,
                       calibrated=False, calib_percent=40.0)
    out = render_table({3: ("rs41", t)})
    assert "12.5000S" in out and "45.2500W" in out
    assert "\x1b[33m" in out and "(40%)" in out      # yellow + percent
    t.calibrated = True
    out = render_table({3: ("rs41", t)})
    assert "\x1b[33m" not in out and "(40%)" not in out
    assert "T1" in out and "350.0" in out
    # optional receiver-health columns: chip quality and AFC offset
    out = render_table({3: ("rs41", t)}, quality={3: 0.41},
                       afc_hz={3: 1234.0})
    assert "sig" in out and "0.41" in out
    assert "afc Hz" in out and "+1234" in out
    out = render_table({3: ("rs41", t)}, quality={})   # missing -> dash
    assert "sig" in out


def test_jsonl_sink(tmp_path):
    p = tmp_path / "t.jsonl"
    w = JSONLWriter(str(p))
    t = SondeTelemetry()
    t.merge(TelemetryFragment(fields=Fields.SERIAL, serial="Z9"))
    w.add_point(t, channel=17, sonde_type="rs41")
    w.deinit()
    rec = json.loads(p.read_text().splitlines()[0])
    assert rec["channel"] == 17 and rec["type"] == "rs41" and rec["serial"] == "Z9"


def test_iq_roundtrip(tmp_path):
    import numpy as np
    from sondetpu.io import iq_from_file, write_iq
    from sondetpu.io.iq import IQFileSource

    rng = np.random.default_rng(0)
    iq = (rng.normal(size=1000) + 1j * rng.normal(size=1000)).astype(np.complex64) * 0.1
    for fmt, tol in [("cf32", 0), ("cs16", 1e-4), ("cs8", 1e-2)]:
        f = tmp_path / f"x.{fmt}"
        write_iq(str(f), iq, fmt)
        back = iq_from_file(str(f))
        assert back.dtype == np.complex64
        np.testing.assert_allclose(back, iq, atol=tol + 1e-7)
    src = IQFileSource(str(tmp_path / "x.cf32"), block_len=256)
    blocks = list(src.blocks())
    assert len(blocks) == 4
    assert blocks[-1][1] == 1000 - 3 * 256
    total = np.concatenate([b for b, _ in blocks])[:1000]
    np.testing.assert_allclose(total, iq, atol=1e-7)


def test_multi_gpx_interleaved_sondes(tmp_path):
    """Mixed-fleet GPX: interleaved updates from two sondes with COLLIDING
    timestamps produce two complete tracks (a single-track writer thrashed
    and cross-dropped points), names XML-escaped, file well-formed."""
    import xml.dom.minidom

    from sondetpu.io.gpx import MultiGPXWriter

    p = tmp_path / "multi.gpx"
    w = MultiGPXWriter(str(p))
    for i in range(6):
        t = 1.7e9 + i                      # same second for both sondes
        w.add_track_point("A123", t, 45.0 + i * 1e-3, 9.0, 1000.0 + i, 5, 90)
        w.add_track_point("B&<7", t, 52.0 + i * 1e-3, 21.0, 2000.0 + i, 5, 90)
    w.deinit()
    doc = xml.dom.minidom.parse(str(p))    # parse == well-formed
    trks = doc.getElementsByTagName("trk")
    names = sorted(t.getElementsByTagName("name")[0].firstChild.nodeValue
                   for t in trks)
    assert names == ["A123", "B&<7"]
    counts = [len(t.getElementsByTagName("trkpt")) for t in trks]
    assert counts == [6, 6]


def test_jsonl_unopenable_path_raises(tmp_path):
    import pytest as _pytest

    from sondetpu.io.jsonl import JSONLWriter

    with _pytest.raises(OSError):
        JSONLWriter(str(tmp_path / "no-such-dir" / "out.jsonl"))


def test_convert_to_c64_truncated_file():
    """A cs16 capture cut mid-sample must decode the whole samples, not
    crash the NumPy fallback with a broadcast error."""
    import os

    import numpy as np
    import sondetpu.io.iq as iqmod
    from sondetpu.io.iq import convert_to_c64

    prior = os.environ.get("SONDETPU_NO_NATIVE")
    os.environ["SONDETPU_NO_NATIVE"] = "1"
    try:
        iqmod._native = None               # force reload under the switch
        raw = np.arange(7, dtype=np.int16)     # odd scalar count
        out = convert_to_c64(raw, "cs16")
        assert out.shape == (3,)
    finally:
        # restore the EXTERNAL kill-switch state (popping it would turn
        # native code back on for the rest of a SONDETPU_NO_NATIVE=1 run)
        if prior is None:
            os.environ.pop("SONDETPU_NO_NATIVE", None)
        else:
            os.environ["SONDETPU_NO_NATIVE"] = prior
        iqmod._native = None


def test_multigpx_crash_loses_at_most_one_point_per_track(tmp_path):
    """Fleet-scale crash safety (VERDICT r3 item 10): every accepted point
    is flushed to a per-serial segment file before anything else, so a
    SIGKILL mid-run loses at most the one partially-written point per
    track, and a fresh init() on the same path recovers the rest into
    valid XML."""
    import subprocess
    import sys
    import xml.etree.ElementTree as ET

    p = tmp_path / "fleet.gpx"
    code = f"""
import sys
sys.path.insert(0, {repr(str(__import__('pathlib').Path(__file__).parent.parent))})
from sondetpu.io.gpx import MultiGPXWriter
w = MultiGPXWriter({str(p)!r})
for i in range(40):
    for s in ("RS41-A", "M10-B"):
        w.add_track_point(s, 1.7e9 + i, 47.0 + i * 1e-3, 8.0, 1000.0 + i,
                          5.0, 90.0)
    print("PT", i, flush=True)
    if i == 33:
        import os, signal
        os.kill(os.getpid(), signal.SIGKILL)   # crash mid-run, no deinit
"""
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True)
    assert r.returncode != 0                       # really died
    written = sum(1 for ln in r.stdout.splitlines() if ln.startswith("PT"))
    assert written >= 30

    # recovery: a new writer on the same path adopts the segments
    from sondetpu.io.gpx import MultiGPXWriter
    w2 = MultiGPXWriter(str(p))
    tree = ET.parse(p)                             # valid XML
    ns = {"g": "http://www.topografix.com/GPX/1/1"}
    trks = tree.getroot().findall("g:trk", ns)
    by_name = {t.find("g:name", ns).text:
               len(t.findall(".//g:trkpt", ns)) for t in trks}
    assert set(by_name) == {"RS41-A", "M10-B"}
    for name, npts in by_name.items():
        assert npts >= written - 1, (name, npts, written)   # <=1 lost point
    # the recovered writer keeps appending to the same tracks
    w2.add_track_point("RS41-A", 1.8e9, 48.0, 8.0, 2000.0, 5.0, 90.0)
    w2.deinit()
    tree = ET.parse(p)
    trks = tree.getroot().findall("g:trk", ns)
    by_name = {t.find("g:name", ns).text:
               len(t.findall(".//g:trkpt", ns)) for t in trks}
    assert by_name["RS41-A"] >= written
    assert not (tmp_path / "fleet.gpx.d").exists()  # clean close tidies up


def test_multigpx_torn_tail_then_append_stays_valid_xml(tmp_path):
    """A seg file left with a PARTIAL trailing point (crash mid-append)
    must be truncated at adoption: otherwise the next append lands after
    the torn bytes and the rebuilt master is malformed XML forever."""
    import xml.etree.ElementTree as ET
    from sondetpu.io.gpx import MultiGPXWriter

    p = tmp_path / "fleet.gpx"
    w = MultiGPXWriter(str(p))
    for i in range(3):
        w.add_track_point("RS41-A", 1.7e9 + i, 47.0 + i * 1e-3, 8.0,
                          1000.0 + i, 5.0, 90.0)
    w.deinit_keep_segments() if hasattr(w, "deinit_keep_segments") else None
    # simulate the torn tail directly in the segment file
    seg = next(f for f in (tmp_path / "fleet.gpx.d").iterdir()
               if f.suffix == ".seg")
    with open(seg, "ab") as f:
        f.write(b'<trkpt lat="47.1')              # crash mid-append
    for fd in w._segs.values():
        fd.close()

    w2 = MultiGPXWriter(str(p))                    # adoption truncates
    w2.add_track_point("RS41-A", 1.7e9 + 9, 47.9, 8.0, 1009.0, 5.0, 90.0)
    w2.flush() if hasattr(w2, "flush") else w2._rewrite()
    tree = ET.parse(p)                             # must stay well-formed
    ns = {"g": "http://www.topografix.com/GPX/1/1"}
    pts = tree.getroot().findall(".//g:trkpt", ns)
    assert len(pts) == 4                           # 3 intact + 1 appended


def test_multigpx_adoption_leaves_foreign_files_untouched(tmp_path):
    """init() crash-recovery adoption must only truncate/count files whose
    first line is a '#serial ' header: a foreign file living in the .d
    directory (another tool's output, a torn-header segment) must survive
    byte-identical (ADVICE r4 medium)."""
    from sondetpu.io.gpx import MultiGPXWriter

    p = tmp_path / "fleet.gpx"
    d = tmp_path / "fleet.gpx.d"
    d.mkdir()
    foreign = d / "notes.txt"
    # no trailing "</trkpt>\n" anywhere -> the old code truncated this to
    # its first line; content chosen so truncation is observable
    payload = b"some unrelated file\nwith several lines\nno gpx inside\n"
    foreign.write_bytes(payload)
    torn = d / "torn.seg"
    torn_payload = b"#seri"          # torn header: NOT a valid segment
    torn.write_bytes(torn_payload)
    w = MultiGPXWriter(str(p))
    assert foreign.read_bytes() == payload
    assert torn.read_bytes() == torn_payload
    assert w._total == 0             # foreign points never counted
    w.add_track_point("S1", 1.7e9, 45.0, 9.0, 1000.0, 5, 90)
    w.deinit()
    assert foreign.read_bytes() == payload
