"""Crash-safe GPX 1.1 track writer.

Re-implements the reference GPX sink semantics (src/gpx.cpp:9-120):

- the file on disk is *always* valid XML: after every mutation the closing
  tags are rewritten at the current offset and the offset rewound
  (``terminateFile`` trick, gpx.cpp:98-110);
- one ``<trk>`` per sonde serial; ``start_track`` with the currently-active
  name is a no-op, a different name closes the old track (gpx.cpp:39-57);
- serial names must be printable-non-space only (``isgraph`` check,
  gpx.cpp:43);
- points are dropped when lat/lon/alt contain NaN, when all three are zero,
  or when either the timestamp or the full position repeats the previous
  point (dedup rules gpx.cpp:76-78).
"""

from __future__ import annotations

import math
import os
import time as _time
from typing import Optional

_GPX_HEADER = (
    '<?xml version="1.0" encoding="UTF-8" standalone="no" ?>\n'
    '<gpx xmlns="http://www.topografix.com/GPX/1/1" version="1.1" creator="sondetpu">\n'
)


class GPXWriter:
    def __init__(self, fname: Optional[str] = None):
        self._fd = None
        self._offset = 0
        self._track_active = False
        self._serial = ""
        self._lat = self._lon = self._alt = 0.0
        self._time = 0.0
        if fname is not None:
            if not self.init(fname):
                raise OSError(f"cannot open GPX file {fname!r}")

    def init(self, fname: str) -> bool:
        if self._fd:
            self.deinit()
        try:
            self._fd = open(fname, "wb")
        except OSError:
            self._fd = None
            return False
        self._lat = self._lon = self._alt = 0.0
        self._time = 0.0
        self._track_active = False
        self._fd.write(_GPX_HEADER.encode())
        self._offset = self._fd.tell()
        self._terminate_file()
        return True

    def deinit(self) -> None:
        if not self._fd:
            return
        self._terminate_file()
        self._fd.close()
        self._fd = None

    close = deinit

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.deinit()

    def start_track(self, name: str) -> None:
        if not self._fd:
            return
        if self._track_active and name == self._serial:
            return
        # isgraph(): printable and not a space (gpx.cpp:43)
        if any((not c.isprintable()) or c.isspace() for c in name):
            return
        if self._track_active:
            self.stop_track()
        self._serial = name
        from xml.sax.saxutils import escape
        self._fd.seek(self._offset)
        # escape &, <, > — isgraph admits them, and the file's core
        # invariant is "always well-formed XML"
        self._fd.write(
            f"<trk>\n<name>{escape(name)}</name>\n<trkseg>\n".encode())
        self._offset = self._fd.tell()
        self._track_active = True
        self._terminate_file()

    def stop_track(self) -> None:
        if not self._fd or not self._track_active:
            return
        self._stop_track_internal()
        self._track_active = False
        self._terminate_file()

    def add_track_point(
        self, time: float, lat: float, lon: float, alt: float, spd: float, hdg: float
    ) -> None:
        if not self._fd or not self._track_active:
            return
        if math.isnan(lat) or math.isnan(lon) or math.isnan(alt):
            return
        if lat == 0 and lon == 0 and alt == 0:
            return
        if time == self._time or (lat == self._lat and lon == self._lon and alt == self._alt):
            return
        self._lat, self._lon, self._alt, self._time = lat, lon, alt, time
        timestr = _time.strftime("%Y-%m-%dT%H:%M:%SZ", _time.gmtime(time))
        self._fd.seek(self._offset)
        self._fd.write(
            (
                f'<trkpt lat="{lat:f}" lon="{lon:f}">\n'
                f"<time>{timestr}</time>\n"
                f"<ele>{alt:f}</ele>\n"
                f"<speed>{spd:f}</speed>\n"
                f"<course>{hdg:f}</course>\n"
                f"</trkpt>\n"
            ).encode()
        )
        self._offset = self._fd.tell()
        self._terminate_file()

    def _stop_track_internal(self) -> None:
        self._fd.seek(self._offset)
        self._fd.write(b"</trkseg>\n</trk>\n")
        self._offset = self._fd.tell()

    def _terminate_file(self) -> None:
        saved = self._offset
        self._fd.seek(self._offset)
        if self._track_active:
            self._stop_track_internal()
        self._fd.write(b"</gpx>\n")
        self._fd.truncate()
        self._fd.flush()
        self._offset = saved


class MultiGPXWriter:
    """GPX writer for MIXED fleets: one <trk> per sonde serial with
    PER-SERIAL dedup state, safe under interleaved updates from many
    concurrent sondes (a single GPXWriter would thrash start_track on
    every alternation and its writer-global dedup would drop points whose
    timestamps collide across sondes). The file is rewritten atomically
    (tmp + replace), so it is ALWAYS complete well-formed XML; unlike
    GPXWriter's per-point terminate-file trick, a crash loses at most the
    points since the last rewrite (bounded to ~1/8 of the file by the
    adaptive flush below — the price of supporting interleaved tracks in
    one file without O(total^2) rewrite cost)."""

    MIN_FLUSH = 8            # rewrites are O(total points): flushing every
                             # max(8, total/8) adds keeps total rewrite work
                             # O(n log n) on long runs instead of O(n^2)

    def __init__(self, path: str = ""):
        self._path = ""
        self._tracks: "dict[str, list[str]]" = {}
        self._last: "dict[str, tuple]" = {}
        self._pending = 0
        if path:
            if not self.init(path):
                raise OSError(f"cannot open GPX output {path!r}")

    def init(self, path: str) -> bool:
        if self._path:
            self._rewrite()                # persist the previous file
        try:
            with open(path, "wb") as f:
                f.write(_GPX_HEADER.encode())
                f.write(b"</gpx>\n")
        except OSError:
            return False
        # fresh file: fresh tracks and dedup state (re-init must not leak
        # the previous file's contents into the new one)
        self._tracks = {}
        self._last = {}
        self._pending = 0
        self._path = path
        return True

    def add_track_point(self, serial: str, time: float, lat: float,
                        lon: float, alt: float, spd: float, hdg: float) -> None:
        if not self._path or not serial:
            return
        if any((not c.isprintable()) or c.isspace() for c in serial):
            return
        if math.isnan(lat) or math.isnan(lon) or math.isnan(alt):
            return
        if lat == 0 and lon == 0 and alt == 0:
            return
        last = self._last.get(serial)
        if last is not None and (time == last[0] or
                                 (lat, lon, alt) == last[1:]):
            return
        self._last[serial] = (time, lat, lon, alt)
        timestr = _time.strftime("%Y-%m-%dT%H:%M:%SZ", _time.gmtime(time))
        self._tracks.setdefault(serial, []).append(
            f'<trkpt lat="{lat:f}" lon="{lon:f}">\n'
            f"<time>{timestr}</time>\n"
            f"<ele>{alt:f}</ele>\n"
            f"<speed>{spd:f}</speed>\n"
            f"<course>{hdg:f}</course>\n"
            f"</trkpt>\n")
        self._pending += 1
        total = sum(len(p) for p in self._tracks.values())
        if self._pending >= max(self.MIN_FLUSH, total // 8):
            self._rewrite()

    def _rewrite(self) -> None:
        from xml.sax.saxutils import escape
        tmp = self._path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(_GPX_HEADER.encode())
            for serial, pts in self._tracks.items():
                f.write(f"<trk>\n<name>{escape(serial)}</name>\n"
                        f"<trkseg>\n".encode())
                for p in pts:
                    f.write(p.encode())
                f.write(b"</trkseg>\n</trk>\n")
            f.write(b"</gpx>\n")
        os.replace(tmp, self._path)
        self._pending = 0

    def deinit(self) -> None:
        if self._path:
            self._rewrite()
        self._path = ""

    close = deinit
