"""Geodesic helpers (SURVEY X11).

The reference uses geopy's ellipsoidal geodesic (random_walk_utils.py:27);
we use the haversine great-circle formula in pure built-in expressions
(≈0.5% vs ellipsoid — irrelevant given the reference's degenerate
155,000 km threshold).  Everything stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km between two (lat, lon) degree pairs."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = F.pow(F.sin(dlat), 2) + F.cos(rlat1) * F.cos(rlat2) * F.pow(F.sin(dlon), 2)
    # clamp for float noise so asin never sees > 1
    return 2 * EARTH_RADIUS_KM * F.asin(F.sqrt(F.least(a, F.lit(1.0))))


HAVERSINE_SQL = """
    2 * 6371.0088 * asin(sqrt(least(1.0,
        pow(sin(radians({lat2} - {lat1}) / 2), 2)
        + cos(radians({lat1})) * cos(radians({lat2}))
          * pow(sin(radians({lon2} - {lon1}) / 2), 2))))
"""
