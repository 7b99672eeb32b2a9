"""3-D world building from real-world scene data — headless equivalent of
``sar_simulator_ursina.py``.

The reference builds an interactive Ursina world: land/water meshes from the
elevation grid, buildings as boxes, roads as strips, with per-material colors
(:1-281). Here the same scene construction is pure geometry — triangle
meshes with materials — exportable to Wavefront OBJ (any 3-D viewer) and
renderable to a preview PNG via matplotlib; the same meshes feed
``scene.materials.features_to_point_targets`` for simulation.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import numpy as np

from nis_sar_amtigmti_video_tpu.scene.materials import (ElevationGrid,
                                                        SceneFeature,
                                                        material_for)


@dataclass
class Mesh:
    name: str
    material: str
    vertices: np.ndarray   # (V, 3)
    faces: np.ndarray      # (F, 3) int indices into vertices

    @property
    def color(self):
        return material_for(self.material)["color"]


def extrude_polygon(polygon: np.ndarray, height: float,
                    z0: float = 0.0) -> Tuple[np.ndarray, np.ndarray]:
    """Prism mesh from a 2-D outline: roof fan + vertical walls."""
    poly = np.asarray(polygon, np.float64)
    if np.allclose(poly[0], poly[-1]) and poly.shape[0] > 1:
        poly = poly[:-1]
    n = poly.shape[0]
    if n < 3:
        return np.zeros((0, 3)), np.zeros((0, 3), int)
    bottom = np.column_stack([poly, np.full(n, z0)])
    top = np.column_stack([poly, np.full(n, z0 + height)])
    verts = np.concatenate([bottom, top])
    faces = []
    # roof (fan)
    for i in range(1, n - 1):
        faces.append((n, n + i, n + i + 1))
    # walls
    for i in range(n):
        j = (i + 1) % n
        faces.append((i, j, n + j))
        faces.append((i, n + j, n + i))
    return verts, np.asarray(faces, int)


def strip_mesh(polyline: np.ndarray, width: float,
               z0: float = 0.05) -> Tuple[np.ndarray, np.ndarray]:
    """Flat ribbon along a polyline (roads, the reference's 'pipes')."""
    line = np.asarray(polyline, np.float64)
    if line.shape[0] < 2:
        return np.zeros((0, 3)), np.zeros((0, 3), int)
    d = np.gradient(line, axis=0)
    norm = np.linalg.norm(d, axis=1, keepdims=True)
    d = d / np.where(norm == 0, 1.0, norm)
    perp = np.column_stack([-d[:, 1], d[:, 0]]) * (width / 2.0)
    left = line + perp
    right = line - perp
    n = line.shape[0]
    verts = np.column_stack([
        np.concatenate([left, right]),
        np.full(2 * n, z0)])
    verts = verts.reshape(2 * n, 3)
    faces = []
    for i in range(n - 1):
        faces.append((i, i + 1, n + i))
        faces.append((i + 1, n + i + 1, n + i))
    return verts, np.asarray(faces, int)


def terrain_mesh(elev: ElevationGrid, water_level: float | None = None
                 ) -> List[Mesh]:
    """Ground mesh from the elevation grid (+ optional flat water plane)."""
    xs, ys, z = elev.xs, elev.ys, elev.z
    gx, gy = np.meshgrid(xs, ys, indexing="xy")
    verts = np.column_stack([gx.ravel(), gy.ravel(), z.ravel()])
    nx, ny = xs.size, ys.size
    faces = []
    for j in range(ny - 1):
        for i in range(nx - 1):
            a = j * nx + i
            faces.append((a, a + 1, a + nx))
            faces.append((a + 1, a + nx + 1, a + nx))
    out = [Mesh("terrain", "grass", verts, np.asarray(faces, int))]
    if water_level is not None:
        w = np.array([[xs[0], ys[0], water_level], [xs[-1], ys[0], water_level],
                      [xs[-1], ys[-1], water_level], [xs[0], ys[-1], water_level]])
        out.append(Mesh("water", "water", w,
                        np.array([[0, 1, 2], [0, 2, 3]])))
    return out


def dual_terrain_mesh(elev: ElevationGrid, water_threshold: float = 1.0
                      ) -> List[Mesh]:
    """Land/water dual meshes split per grid cell, the reference's dual-mesh
    terrain (sar_simulator_ursina.py:39-112): a cell whose mean elevation is
    below ``water_threshold`` becomes flat water at z=0; land cells keep
    their elevations clamped to >= -0.1 (gap-closing without z-fighting)."""
    xs, ys, z = elev.xs, elev.ys, elev.z
    nx, ny = xs.size, ys.size
    gx, gy = np.meshgrid(xs, ys, indexing="xy")
    cell_mean = 0.25 * (z[:-1, :-1] + z[:-1, 1:] + z[1:, :-1] + z[1:, 1:])
    is_water = cell_mean < water_threshold

    land_verts = np.column_stack([gx.ravel(), gy.ravel(),
                                  np.maximum(z.ravel(), -0.1)])
    water_verts = np.column_stack([gx.ravel(), gy.ravel(),
                                   np.zeros(nx * ny)])
    a = (np.arange(ny - 1)[:, None] * nx + np.arange(nx - 1)[None, :])
    quad = np.stack([a, a + 1, a + nx, a + 1, a + nx + 1, a + nx], axis=-1)
    tris = quad.reshape(ny - 1, nx - 1, 2, 3)
    land_faces = tris[~is_water].reshape(-1, 3)
    water_faces = tris[is_water].reshape(-1, 3)
    out: List[Mesh] = []
    if land_faces.shape[0]:
        out.append(Mesh("terrain", "grass", land_verts, land_faces))
    if water_faces.shape[0]:
        out.append(Mesh("water", "water", water_verts, water_faces))
    return out


def scatter_terrain_mesh(points_xy: np.ndarray, z: np.ndarray,
                         kind: str = "grass") -> Mesh:
    """Terrain mesh from *scattered* (non-grid) elevation samples via
    Delaunay triangulation (scene.materials.delaunay_triangulate — the
    capability behind the reference's scipy.spatial.Delaunay import,
    sar_scene_data.py:5). Grid terrains keep :func:`terrain_mesh`."""
    from nis_sar_amtigmti_video_tpu.scene.materials import delaunay_triangulate

    pts = np.asarray(points_xy, np.float64)
    verts = np.column_stack([pts, np.asarray(z, np.float64)])
    return Mesh("terrain", kind, verts, delaunay_triangulate(pts))


def build_world(features: Sequence[SceneFeature],
                elevation: Optional[ElevationGrid] = None,
                road_width: float = 6.0,
                water_level: Optional[float] = None) -> List[Mesh]:
    """Scene features -> mesh list (buildings extruded, roads as strips)."""
    meshes: List[Mesh] = []
    if elevation is not None:
        meshes.extend(terrain_mesh(elevation, water_level))
    for i, f in enumerate(features):
        z0 = 0.0
        if elevation is not None:
            c = f.polygon_m.mean(axis=0)
            z0 = float(elevation.elevation_at(c[0], c[1]))
        if f.kind in ("building", "house"):
            v, fc = extrude_polygon(f.polygon_m, f.height_m, z0)
        elif f.kind == "road":
            v, fc = strip_mesh(f.polygon_m, road_width, z0 + 0.05)
        else:
            v, fc = extrude_polygon(f.polygon_m, max(f.height_m, 0.01), z0)
        if v.shape[0]:
            meshes.append(Mesh(f"{f.kind}_{i}", f.kind, v, fc))
    return meshes


def placement_meshes(placements=None,
                     elevation: Optional[ElevationGrid] = None) -> List[Mesh]:
    """Placed vehicle/aircraft models -> render meshes, the world-viewer
    half of the scene-model registry (the reference places FBX models with
    per-material colors, sar_simulator_ursina.py:247-266; here each placed
    point-scatterer model renders as its material-colored bounding hull
    plus per-scatterer studs so pose/heading read in the preview)."""
    from nis_sar_amtigmti_video_tpu.scene.materials import (
        SCENE_PLACEMENTS, _placement_model)

    if placements is None:
        placements = SCENE_PLACEMENTS
    meshes: List[Mesh] = []
    for i, pl in enumerate(placements):
        x, y = pl.position_m
        z = pl.height_offset_m
        if elevation is not None:
            z = z + float(elevation.elevation_at(x, y))
        pts = (_placement_model(pl.model).rotate_z(pl.heading_deg)
               .translate((x, y, z)).positions)
        lo, hi = pts.min(axis=0), pts.max(axis=0)
        pad = 0.25 * max(1.0, float((hi - lo)[:2].max()) * 0.05)
        rect = np.array([[lo[0] - pad, lo[1] - pad], [hi[0] + pad, lo[1] - pad],
                         [hi[0] + pad, hi[1] + pad], [lo[0] - pad, hi[1] + pad]])
        v, fc = extrude_polygon(rect, max(float(hi[2] - lo[2]), 0.5),
                                float(lo[2]))
        meshes.append(Mesh(f"model_{i}_{pl.model}", pl.material, v, fc))
        # scatterer studs: small boxes marking the point-target layout
        studs_v, studs_f = [], []
        off = 0
        for px, py, pz in pts:
            sv, sf = extrude_polygon(
                np.array([[px - 0.3, py - 0.3], [px + 0.3, py - 0.3],
                          [px + 0.3, py + 0.3], [px - 0.3, py + 0.3]]),
                0.6, pz)
            studs_v.append(sv)
            studs_f.append(sf + off)
            off += sv.shape[0]
        meshes.append(Mesh(f"model_{i}_{pl.model}_points", "metal",
                           np.concatenate(studs_v), np.concatenate(studs_f)))
    return meshes


def export_obj(path: str, meshes: Sequence[Mesh]) -> str:
    """Wavefront OBJ + MTL with per-material colors."""
    mtl_path = path.rsplit(".", 1)[0] + ".mtl"
    mats = {}
    with open(path, "w") as f:
        f.write(f"mtllib {mtl_path.split('/')[-1]}\n")
        offset = 1
        for m in meshes:
            mats[m.material] = m.color
            f.write(f"o {m.name}\nusemtl {m.material}\n")
            for v in m.vertices:
                f.write(f"v {v[0]:.3f} {v[1]:.3f} {v[2]:.3f}\n")
            for a, b, c in m.faces:
                f.write(f"f {a+offset} {b+offset} {c+offset}\n")
            offset += m.vertices.shape[0]
    with open(mtl_path, "w") as f:
        for name, color in mats.items():
            f.write(f"newmtl {name}\nKd {color[0]:.3f} {color[1]:.3f} "
                    f"{color[2]:.3f}\n")
    return path


def render_preview(path: str, meshes: Sequence[Mesh], elev_deg: float = 35.0,
                   azim_deg: float = -60.0) -> str:
    """Static 3-D preview PNG (matplotlib Poly3DCollection)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from mpl_toolkits.mplot3d.art3d import Poly3DCollection

    fig = plt.figure(figsize=(10, 8))
    ax = fig.add_subplot(projection="3d")
    lims = []
    for m in meshes:
        tris = m.vertices[m.faces]
        pc = Poly3DCollection(tris, facecolor=m.color, edgecolor="k",
                              linewidths=0.1, alpha=0.95)
        ax.add_collection3d(pc)
        lims.append(m.vertices)
    allv = np.concatenate(lims)
    for setter, i in ((ax.set_xlim, 0), (ax.set_ylim, 1)):
        setter(allv[:, i].min(), allv[:, i].max())
    ax.set_zlim(0, max(1.0, allv[:, 2].max() * 2))
    ax.view_init(elev=elev_deg, azim=azim_deg)
    ax.set_axis_off()
    fig.savefig(path, dpi=110, bbox_inches="tight")
    plt.close(fig)
    return path
