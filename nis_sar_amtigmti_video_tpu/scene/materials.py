"""Real-world scene modeling: materials, geodesy, triangulation, elevation.

Re-design of ``sar_scene_data.py``: the per-landcover material dictionary
(:9-69), scene model placements (:73-128), lat/lon local-meter projection
(:131-134), fan triangulation (:146-174), and the elevation-grid container
with bilinear lookup (:223-241).

Network access (Overpass/Open-Elevation, :185-339) is *gated*: this
environment is zero-egress, and production TPU pods often are too, so
``SceneFetcher`` accepts pre-fetched JSON/elevation payloads (the documented
formats) and only touches HTTP when explicitly asked with ``online=True``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

# Per-landcover radar/visual material properties: color (viz), roughness and
# dielectric constant (backscatter modeling) — the reference's MATERIALS
# mapping (sar_scene_data.py:9-69), values preserved by class.
MATERIALS: Dict[str, dict] = {
    "building": {"color": (0.72, 0.68, 0.64), "roughness": 0.7,
                 "dielectric": 5.0, "height_m": 9.0},
    "house": {"color": (0.75, 0.70, 0.62), "roughness": 0.7,
              "dielectric": 5.0, "height_m": 6.0},
    "road": {"color": (0.25, 0.25, 0.27), "roughness": 0.3,
             "dielectric": 6.0, "height_m": 0.0},
    "water": {"color": (0.15, 0.35, 0.55), "roughness": 0.05,
              "dielectric": 80.0, "height_m": 0.0},
    "grass": {"color": (0.35, 0.55, 0.25), "roughness": 0.9,
              "dielectric": 15.0, "height_m": 0.2},
    "forest": {"color": (0.18, 0.38, 0.16), "roughness": 1.0,
               "dielectric": 20.0, "height_m": 12.0},
    "farmland": {"color": (0.55, 0.5, 0.3), "roughness": 0.8,
                 "dielectric": 12.0, "height_m": 0.3},
    "sand": {"color": (0.8, 0.75, 0.55), "roughness": 0.6,
             "dielectric": 3.0, "height_m": 0.0},
    "rock": {"color": (0.5, 0.48, 0.45), "roughness": 0.85,
             "dielectric": 6.0, "height_m": 0.5},
    "default": {"color": (0.5, 0.5, 0.5), "roughness": 0.5,
                "dielectric": 8.0, "height_m": 0.0},
}


def material_for(kind: str) -> dict:
    return MATERIALS.get(kind, MATERIALS["default"])


def latlon_to_meters(lat: float, lon: float, lat0: float, lon0: float
                     ) -> Tuple[float, float]:
    """Local tangent-plane projection (sar_scene_data.py:131-134):
    x = east meters, y = north meters about (lat0, lon0)."""
    r = 6371000.0
    x = math.radians(lon - lon0) * r * math.cos(math.radians(lat0))
    y = math.radians(lat - lat0) * r
    return x, y


def triangulate_polygon(vertices: Sequence[Sequence[float]]) -> np.ndarray:
    """Fan triangulation of a simple polygon (sar_scene_data.py:146-174):
    returns (n-2, 3, 2) triangles. Degenerate inputs return empty."""
    v = np.asarray(vertices, np.float64)
    if v.shape[0] < 3:
        return np.zeros((0, 3, 2))
    # drop duplicated closing vertex
    if np.allclose(v[0], v[-1]):
        v = v[:-1]
    if v.shape[0] < 3:
        return np.zeros((0, 3, 2))
    tris = [(v[0], v[i], v[i + 1]) for i in range(1, v.shape[0] - 1)]
    return np.asarray(tris)


def polygon_area(vertices: Sequence[Sequence[float]]) -> float:
    """Shoelace area (m^2) of a projected polygon."""
    v = np.asarray(vertices, np.float64)
    if v.shape[0] < 3:
        return 0.0
    x, y = v[:, 0], v[:, 1]
    return 0.5 * abs(float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))))


@dataclass
class ElevationGrid:
    """Regular elevation grid with bilinear lookup
    (sar_scene_data.py:185-241)."""

    xs: np.ndarray        # (Nx,) east coordinates [m]
    ys: np.ndarray        # (Ny,) north coordinates [m]
    z: np.ndarray         # (Ny, Nx) elevations [m]

    def elevation_at(self, x, y):
        """Bilinear interpolation, clamped to the grid edges."""
        xs, ys, z = self.xs, self.ys, self.z
        fx = np.clip((np.asarray(x) - xs[0]) / (xs[1] - xs[0]), 0, len(xs) - 1)
        fy = np.clip((np.asarray(y) - ys[0]) / (ys[1] - ys[0]), 0, len(ys) - 1)
        ix = np.clip(np.floor(fx).astype(int), 0, len(xs) - 2)
        iy = np.clip(np.floor(fy).astype(int), 0, len(ys) - 2)
        wx, wy = fx - ix, fy - iy
        return ((1 - wy) * ((1 - wx) * z[iy, ix] + wx * z[iy, ix + 1])
                + wy * ((1 - wx) * z[iy + 1, ix] + wx * z[iy + 1, ix + 1]))

    @staticmethod
    def flat(half_width_m: float = 1000.0, n: int = 2) -> "ElevationGrid":
        xs = np.linspace(-half_width_m, half_width_m, n)
        return ElevationGrid(xs, xs.copy(), np.zeros((n, n)))


@dataclass
class SceneFeature:
    kind: str                         # material key
    polygon_m: np.ndarray             # (N, 2) projected outline
    height_m: float
    tags: dict = field(default_factory=dict)

    @property
    def material(self) -> dict:
        return material_for(self.kind)

    @property
    def triangles(self) -> np.ndarray:
        return triangulate_polygon(self.polygon_m)


class SceneFetcher:
    """Builds SceneFeatures + ElevationGrid around (lat0, lon0).

    Offline-first: pass ``osm_json`` (Overpass response format, the schema
    the reference queries at sar_scene_data.py:243-339) and/or an elevation
    array. ``online=True`` attempts live HTTP (requests) and raises a clear
    error when the environment has no egress.
    """

    OVERPASS_KINDS = (
        ("building", "building"),
        ("highway", "road"),
        ("natural=water", "water"),
        ("landuse=grass", "grass"),
        ("landuse=forest", "forest"),
        ("landuse=farmland", "farmland"),
    )

    def __init__(self, lat0: float, lon0: float, radius_m: float = 500.0,
                 online: bool = False):
        self.lat0, self.lon0, self.radius_m = lat0, lon0, radius_m
        self.online = online

    def _project(self, lat, lon):
        return latlon_to_meters(lat, lon, self.lat0, self.lon0)

    def features_from_osm(self, osm_json: dict) -> List[SceneFeature]:
        """Parse an Overpass 'out geom' response into projected features."""
        feats: List[SceneFeature] = []
        for el in osm_json.get("elements", []):
            geom = el.get("geometry")
            if not geom:
                continue
            tags = el.get("tags", {})
            kind = "default"
            if "building" in tags:
                kind = "house" if tags.get("building") == "house" else "building"
            elif "highway" in tags:
                kind = "road"
            elif tags.get("natural") == "water" or "water" in tags:
                kind = "water"
            elif tags.get("landuse") in ("grass", "meadow"):
                kind = "grass"
            elif tags.get("landuse") in ("forest",) or tags.get("natural") == "wood":
                kind = "forest"
            elif tags.get("landuse") == "farmland":
                kind = "farmland"
            poly = np.asarray([self._project(p["lat"], p["lon"]) for p in geom])
            h = material_for(kind)["height_m"]
            try:
                h = float(tags.get("height", h))
            except (TypeError, ValueError):
                pass
            feats.append(SceneFeature(kind=kind, polygon_m=poly, height_m=h,
                                      tags=tags))
        return feats

    def elevation_from_grid(self, elevations: np.ndarray,
                            half_width_m: Optional[float] = None,
                            smooth_sigma: float = 0.0) -> ElevationGrid:
        """Grid -> ElevationGrid, optionally Gaussian-smoothed.

        The reference smooths every fetched elevation grid with
        ``gaussian_filter(sigma=1.0)`` to remove API quantization jags
        (sar_scene_data.py:211-212); pass ``smooth_sigma=1.0`` for parity
        (the fetch path does so by default)."""
        elevations = np.asarray(elevations, np.float64)
        if smooth_sigma > 0.0:
            from scipy.ndimage import gaussian_filter
            elevations = gaussian_filter(elevations, sigma=smooth_sigma)
        hw = half_width_m or self.radius_m
        ny, nx = elevations.shape
        return ElevationGrid(np.linspace(-hw, hw, nx),
                             np.linspace(-hw, hw, ny), elevations)

    def parse_elevation_response(self, payload: dict, n: int,
                                 smooth_sigma: float = 1.0) -> ElevationGrid:
        """Open-Elevation response -> smoothed grid. Payload schema:
        {'results': [{'latitude','longitude','elevation'}, ...]} in the
        row-major (y over x) order the query built
        (sar_scene_data.py:192-211)."""
        z = np.asarray([p["elevation"] for p in payload["results"]],
                       np.float64)
        return self.elevation_from_grid(z.reshape(n, n),
                                        smooth_sigma=smooth_sigma)

    # ---- online paths (gated; zero-egress safe) ----
    def fetch_osm(self) -> List[SceneFeature]:
        if not self.online:
            raise RuntimeError(
                "SceneFetcher is offline; pass osm_json to features_from_osm "
                "or construct with online=True in a networked environment")
        import requests
        q = (f'[out:json];(way(around:{self.radius_m},{self.lat0},{self.lon0})'
             f'["building"];way(around:{self.radius_m},{self.lat0},{self.lon0})'
             f'["highway"];);out geom;')
        r = requests.post("https://overpass-api.de/api/interpreter",
                          data={"data": q}, timeout=30)
        r.raise_for_status()
        return self.features_from_osm(r.json())

    def fetch_elevation(self, n: int = 16) -> ElevationGrid:
        """Open-Elevation POST (the reference's request format,
        sar_scene_data.py:199-205) + sigma-1 Gaussian smoothing."""
        if not self.online:
            return ElevationGrid.flat(self.radius_m)
        import requests
        lats = np.linspace(-1, 1, n) * self.radius_m / 111320.0 + self.lat0
        lons = (np.linspace(-1, 1, n) * self.radius_m
                / (111320.0 * math.cos(math.radians(self.lat0))) + self.lon0)
        locations = [{"latitude": float(la), "longitude": float(lo)}
                     for la in lats for lo in lons]
        r = requests.post("https://api.open-elevation.com/api/v1/lookup",
                          json={"locations": locations},
                          headers={"Content-Type": "application/json"},
                          timeout=30)
        r.raise_for_status()
        return self.parse_elevation_response(r.json(), n)


def delaunay_triangulate(points_2d: np.ndarray) -> np.ndarray:
    """Delaunay triangulation of scattered 2-D points -> (M, 3) vertex
    indices (scipy). The reference imports scipy.spatial.Delaunay for its
    scene pipeline (sar_scene_data.py:5) — the actual capability lives here:
    terrain meshes from non-grid elevation samples (viz/world.py consumes
    it; grid terrains keep the cheaper regular-grid strips)."""
    from scipy.spatial import Delaunay

    pts = np.asarray(points_2d, np.float64)
    if pts.shape[0] < 3:
        return np.zeros((0, 3), np.int64)
    return Delaunay(pts).simplices.astype(np.int64)


def features_to_point_targets(features: Sequence[SceneFeature],
                              elevation: Optional[ElevationGrid] = None,
                              density_per_m2: float = 0.001,
                              rng: Optional[np.random.Generator] = None):
    """Rasterize scene features into point scatterers for the echo engine:
    scatterer density per area, RCS from dielectric/roughness, z from the
    feature height + terrain. This is the bridge from real-world scenes to
    the point-target simulator (new capability; the reference only renders
    these scenes visually)."""
    from nis_sar_amtigmti_video_tpu.scene.targets import PointTargets

    rng = rng or np.random.default_rng(0)
    pos, rcs, names = [], [], []
    for fi, f in enumerate(features):
        tris = f.triangles
        if tris.shape[0] == 0:
            continue
        e1 = tris[:, 1] - tris[:, 0]
        e2 = tris[:, 2] - tris[:, 0]
        areas = 0.5 * np.abs(e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0])
        total = float(areas.sum())
        n_pts = max(1, int(total * density_per_m2))
        t_idx = rng.choice(tris.shape[0], n_pts, p=areas / max(total, 1e-12))
        u = rng.random(n_pts)
        v = rng.random(n_pts)
        flip = u + v > 1
        u[flip], v[flip] = 1 - u[flip], 1 - v[flip]
        pts = (tris[t_idx, 0]
               + u[:, None] * (tris[t_idx, 1] - tris[t_idx, 0])
               + v[:, None] * (tris[t_idx, 2] - tris[t_idx, 0]))
        mat = f.material
        z0 = (elevation.elevation_at(pts[:, 0], pts[:, 1])
              if elevation is not None else np.zeros(n_pts))
        z = z0 + f.height_m * rng.random(n_pts)
        # simple backscatter: sigma ~ area/n * dielectric-driven reflectivity
        refl = (mat["dielectric"] / (mat["dielectric"] + 1.0)) ** 2
        sig = (total / n_pts) * refl * (0.2 + 0.8 * mat["roughness"])
        pos.append(np.column_stack([pts, z]))
        rcs.append(np.full(n_pts, sig))
        names.extend([f"{f.kind}_{fi}_{j}" for j in range(n_pts)])
    if not pos:
        return PointTargets(np.zeros((0, 3)), np.zeros(0), ())
    return PointTargets(np.concatenate(pos), np.concatenate(rcs), tuple(names))
