#!/usr/bin/env python3
"""Independent golden vectors for the WGS84 UTM transverse-Mercator path.

Authoring tool only (never imported by library code): generates the literal
oracle rows for the `f3_utm_golden` declared query. Independence argument:
graft's `core/Proj.scala` implements the Krueger n-series (flattening
series in n = f/(2-f), conformal-latitude form); this script implements
REDFEARN's series (NGA TM 8358.2 / Ordnance Survey "A guide to coordinate
systems in Great Britain", expansions in meridian arc M, nu, t = tan(phi),
eta^2 = e'^2 cos^2 phi) in 50-digit mpmath arithmetic, with the inverse
obtained by numerical root-finding on the forward map rather than the
inverse series. The two derivations share no coefficient table, so
agreement at sub-mm over the UTM domain (|lon - lon0| <= ~3 deg) validates
both; Redfearn truncation there is < 0.1 mm.

Cross-checks against published values (public knowledge):
  - Wikipedia "Universal Transverse Mercator coordinate system" worked
    example: CN Tower, 43d38'33.24"N 79d23'13.7"W -> zone 17N
    630084 mE, 4833438 mN (meter precision).
"""
import mpmath as mp

mp.mp.dps = 50

# WGS84
a = mp.mpf("6378137")
f = 1 / mp.mpf("298.257223563")
e2 = f * (2 - f)           # first eccentricity squared
ep2 = e2 / (1 - e2)        # second eccentricity squared
k0 = mp.mpf("0.9996")
E0 = mp.mpf("500000")


def meridian_arc(phi):
    """Series meridian distance from equator (Redfearn/NGA form, to e^10)."""
    e4, e6, e8, e10 = e2**2, e2**3, e2**4, e2**5
    A0 = 1 - e2/4 - 3*e4/64 - 5*e6/256 - 175*e8/16384 - 441*e10/65536
    A2 = mp.mpf(3)/8 * (e2 + e4/4 + 15*e6/128 + 455*e8/4096)
    A4 = mp.mpf(15)/256 * (e4 + 3*e6/4 + 77*e8/128)
    A6 = mp.mpf(35)/3072 * (e6 + 41*e8/32)
    A8 = mp.mpf(315)/131072 * e8
    return a * (A0*phi - A2*mp.sin(2*phi) + A4*mp.sin(4*phi)
                - A6*mp.sin(6*phi) + A8*mp.sin(8*phi))


def utm_forward(lat_deg, lon_deg, epsg):
    """Redfearn series forward: lat/lon (deg) -> (easting, northing)."""
    zone = epsg % 100
    south = epsg >= 32701
    lon0 = mp.radians(zone * 6 - 183)
    N0 = mp.mpf("10000000") if south else mp.mpf(0)
    phi = mp.radians(mp.mpf(str(lat_deg)))
    L = mp.radians(mp.mpf(str(lon_deg))) - lon0
    t = mp.tan(phi)
    t2, t4, t6 = t**2, t**4, t**6
    c = mp.cos(phi)
    eta2 = ep2 * c**2
    nu = a / mp.sqrt(1 - e2 * mp.sin(phi)**2)
    M = meridian_arc(phi)
    E = E0 + k0 * nu * (
        L*c
        + L**3 * c**3 / 6 * (1 - t2 + eta2)
        + L**5 * c**5 / 120 * (5 - 18*t2 + t4 + 14*eta2 - 58*t2*eta2)
        + L**7 * c**7 / 5040 * (61 - 479*t2 + 179*t4 - t6))
    N = N0 + k0 * (M + nu * t * (
        L**2 * c**2 / 2
        + L**4 * c**4 / 24 * (5 - t2 + 9*eta2 + 4*eta2**2)
        + L**6 * c**6 / 720 * (61 - 58*t2 + t4 + 270*eta2 - 330*t2*eta2)
        + L**8 * c**8 / 40320 * (1385 - 3111*t2 + 543*t4 - t6)))
    return E, N


def utm_inverse(easting, northing, epsg):
    """Numerical inverse: root-find the forward map (no inverse series)."""
    zone = epsg % 100
    lon0_deg = zone * 6 - 183
    south = epsg >= 32701
    lat_guess = ((mp.mpf(str(northing)) - (10000000 if south else 0))
                 / mp.mpf("111320") / k0)
    lon_guess = lon0_deg + (mp.mpf(str(easting)) - E0) / mp.mpf("80000")

    def fun(lat, lon):
        E, N = utm_forward(lat, lon, epsg)
        return E - mp.mpf(str(easting)), N - mp.mpf(str(northing))

    lat, lon = mp.findroot(fun, (lat_guess, lon_guess))
    return lat, lon


def q(x, scale):
    """floor(x*scale + 0.5) — the exact integer the query emits."""
    return int(mp.floor(mp.mpf(str(x)) * scale + mp.mpf("0.5")))


def boundary_margin(x, scale):
    """Distance (in quantum units) of x*scale from the nearest .5 flip."""
    v = mp.mpf(str(x)) * scale + mp.mpf("0.5")
    return float(abs(v - mp.floor(v) - mp.mpf("0.5")))


# (name, lat, lon, epsg) — spread over zones, hemispheres, |L| up to ~2.6
# deg off the central meridian, equator and high latitude.
FORWARD = [
    ("cn_tower",     mp.mpf("43.642567"),  mp.mpf("-79.387139"), 32617),
    ("statue_lib",   mp.mpf("40.689247"),  mp.mpf("-74.044502"), 32618),
    ("greenwich",    mp.mpf("51.477928"),  mp.mpf("-0.001545"),  32630),
    ("sydney_oh",    mp.mpf("-33.856784"), mp.mpf("151.215297"), 32756),
    ("cape_town",    mp.mpf("-33.906249"), mp.mpf("18.420397"),  32734),
    ("quito_eq",     mp.mpf("-0.002205"),  mp.mpf("-78.455833"), 32717),
    ("tromso_high",  mp.mpf("69.649208"),  mp.mpf("18.955324"),  32634),
    ("zone_edge",    mp.mpf("35.0"),       mp.mpf("-120.4"),     32710 + 1),  # 32711? no:
]
# fix zone_edge: lon -120.4 -> zone 11N (EPSG 32611), ~2.6 deg west of -117
FORWARD[-1] = ("zone_edge", mp.mpf("35.0"), mp.mpf("-120.4"), 32611)

# (name, easting, northing, epsg) — inverse goldens on round coordinates.
INVERSE = [
    ("inv_z17_cm",   mp.mpf("630084"),  mp.mpf("4833438"), 32617),
    ("inv_z33_mid",  mp.mpf("400000"),  mp.mpf("5000000"), 32633),
    ("inv_z56_s",    mp.mpf("334150"),  mp.mpf("6252310"), 32756),
    ("inv_z30_low",  mp.mpf("700000"),  mp.mpf("100000"),  32630),
]

if __name__ == "__main__":
    print("-- forward: (name, lat, lon, epsg) -> cm-quantized E/N")
    for name, lat, lon, epsg in FORWARD:
        E, N = utm_forward(lat, lon, epsg)
        me, mn = boundary_margin(E, 100), boundary_margin(N, 100)
        print(f"('{name}', {float(lat)!r}, {float(lon)!r}, {epsg}, "
              f"{q(E, 100)}, {q(N, 100)}),  -- margin {me:.3f}/{mn:.3f}  "
              f"E={mp.nstr(E, 15)} N={mp.nstr(N, 15)}")
    print("-- inverse: (name, E, N, epsg) -> 1e-7-deg-quantized lon/lat")
    for name, E, N, epsg in INVERSE:
        lat, lon = utm_inverse(E, N, epsg)
        ml = boundary_margin(lon, 10**7)
        mb = boundary_margin(lat, 10**7)
        print(f"('{name}', {float(E)!r}, {float(N)!r}, {epsg}, "
              f"{q(lon, 10**7)}, {q(lat, 10**7)}),  -- margin {ml:.3f}/{mb:.3f}  "
              f"lon={mp.nstr(lon, 13)} lat={mp.nstr(lat, 13)}")
