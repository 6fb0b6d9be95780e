"""Geodesy and GPS time conversions (SURVEY.md S8).

ECEF <-> WGS84 geodetic, ECEF velocity -> speed/heading/climb, and GPS
week/time-of-week -> UTC — the telemetry/geo math sondedump performs before
filling SondeData (outputs consumed at reference decoder.hpp:64-99).
Vectorized NumPy (host-side; a handful of frames per channel per second).
"""

from __future__ import annotations

import numpy as np

# WGS84 ellipsoid
_A = 6378137.0
_F = 1.0 / 298.257223563
_B = _A * (1.0 - _F)
_E2 = _F * (2.0 - _F)
_EP2 = (_A * _A - _B * _B) / (_B * _B)

# GPS epoch 1980-01-06T00:00:00Z as Unix epoch seconds; current leap offset.
GPS_EPOCH_UNIX = 315964800
GPS_UTC_LEAP_SECONDS = 18


def geodetic_to_ecef(lat_deg, lon_deg, alt_m):
    """WGS84 geodetic -> ECEF metres. Arrays or scalars."""
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    alt = np.asarray(alt_m, dtype=np.float64)
    n = _A / np.sqrt(1.0 - _E2 * np.sin(lat) ** 2)
    x = (n + alt) * np.cos(lat) * np.cos(lon)
    y = (n + alt) * np.cos(lat) * np.sin(lon)
    z = (n * (1.0 - _E2) + alt) * np.sin(lat)
    return x, y, z


def ecef_to_geodetic(x, y, z):
    """ECEF metres -> WGS84 geodetic (Bowring's closed-form approximation,
    sub-millimetre for terrestrial/stratospheric altitudes)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    lon = np.arctan2(y, x)
    p = np.hypot(x, y)
    theta = np.arctan2(z * _A, p * _B)
    lat = np.arctan2(z + _EP2 * _B * np.sin(theta) ** 3,
                     p - _E2 * _A * np.cos(theta) ** 3)
    n = _A / np.sqrt(1.0 - _E2 * np.sin(lat) ** 2)
    alt = p / np.cos(lat) - n
    return np.degrees(lat), np.degrees(lon), alt


def ecef_velocity_to_enu(vx, vy, vz, lat_deg, lon_deg):
    """ECEF velocity -> local East/North/Up components."""
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    ve = -np.sin(lon) * vx + np.cos(lon) * vy
    vn = (-np.sin(lat) * np.cos(lon) * vx - np.sin(lat) * np.sin(lon) * vy
          + np.cos(lat) * vz)
    vu = (np.cos(lat) * np.cos(lon) * vx + np.cos(lat) * np.sin(lon) * vy
          + np.sin(lat) * vz)
    return ve, vn, vu


def enu_to_ecef_velocity(ve, vn, vu, lat_deg, lon_deg):
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    vx = -np.sin(lon) * ve - np.sin(lat) * np.cos(lon) * vn + np.cos(lat) * np.cos(lon) * vu
    vy = np.cos(lon) * ve - np.sin(lat) * np.sin(lon) * vn + np.cos(lat) * np.sin(lon) * vu
    vz = np.cos(lat) * vn + np.sin(lat) * vu
    return vx, vy, vz


def speed_heading_climb(ve, vn, vu):
    """ENU velocity -> (ground speed m/s, heading deg from north, climb m/s)."""
    spd = np.hypot(ve, vn)
    hdg = np.degrees(np.arctan2(ve, vn)) % 360.0
    return spd, hdg, vu


def gps_time_to_utc(week, tow_seconds, leap=GPS_UTC_LEAP_SECONDS):
    """GPS week + time-of-week -> Unix UTC epoch seconds."""
    return GPS_EPOCH_UNIX + np.asarray(week, dtype=np.float64) * 604800.0 \
        + np.asarray(tow_seconds, dtype=np.float64) - leap


def utc_to_gps_time(utc_epoch, leap=GPS_UTC_LEAP_SECONDS):
    """Unix UTC epoch seconds -> (week, tow_seconds)."""
    t = np.asarray(utc_epoch, dtype=np.float64) - GPS_EPOCH_UNIX + leap
    week = np.floor(t / 604800.0)
    tow = t - week * 604800.0
    return week.astype(np.int64), tow
