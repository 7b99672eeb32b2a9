"""Scene materials -> 3-D world -> simulation bridge."""

import os

import numpy as np
import pytest

import nis_sar_amtigmti_video_tpu as nst
from nis_sar_amtigmti_video_tpu.scene.materials import (
    ElevationGrid, SceneFetcher, features_to_point_targets, latlon_to_meters,
    material_for, polygon_area, triangulate_polygon)
from nis_sar_amtigmti_video_tpu.viz import world

OSM = {"elements": [
    {"type": "way", "tags": {"building": "yes", "height": "12"},
     "geometry": [{"lat": 0.0002, "lon": 0.0002}, {"lat": 0.0002, "lon": 0.0004},
                  {"lat": 0.0004, "lon": 0.0004}, {"lat": 0.0004, "lon": 0.0002},
                  {"lat": 0.0002, "lon": 0.0002}]},
    {"type": "way", "tags": {"highway": "residential"},
     "geometry": [{"lat": 0.0, "lon": 0.0}, {"lat": 0.0005, "lon": 0.0003},
                  {"lat": 0.001, "lon": 0.0003}]},
    {"type": "way", "tags": {"natural": "water"},
     "geometry": [{"lat": -0.0004, "lon": -0.0004}, {"lat": -0.0004, "lon": -0.0001},
                  {"lat": -0.0001, "lon": -0.0001}, {"lat": -0.0001, "lon": -0.0004}]},
]}


class TestMaterials:
    def test_latlon_projection(self):
        x, y = latlon_to_meters(0.001, 0.0, 0.0, 0.0)
        assert x == 0.0 and y == pytest.approx(111.19, abs=0.2)

    def test_triangulation_and_area(self):
        sq = [(0, 0), (2, 0), (2, 3), (0, 3)]
        tris = triangulate_polygon(sq)
        assert tris.shape == (2, 3, 2)
        assert polygon_area(sq) == pytest.approx(6.0)
        assert triangulate_polygon([(0, 0), (1, 1)]).shape[0] == 0

    def test_elevation_bilinear(self):
        e = ElevationGrid(np.array([0.0, 10.0]), np.array([0.0, 10.0]),
                          np.array([[0.0, 10.0], [20.0, 30.0]]))
        assert e.elevation_at(5.0, 5.0) == pytest.approx(15.0)
        assert e.elevation_at(0.0, 0.0) == pytest.approx(0.0)
        assert e.elevation_at(100.0, 100.0) == pytest.approx(30.0)  # clamped

    def test_osm_parse(self):
        sf = SceneFetcher(0.0, 0.0, radius_m=120.0)
        feats = sf.features_from_osm(OSM)
        kinds = [f.kind for f in feats]
        assert kinds == ["building", "road", "water"]
        assert feats[0].height_m == 12.0
        assert feats[0].material["dielectric"] == 5.0

    def test_offline_fetch_raises(self):
        with pytest.raises(RuntimeError, match="offline"):
            SceneFetcher(0.0, 0.0).fetch_osm()

    def test_features_to_point_targets(self, rng):
        sf = SceneFetcher(0.0, 0.0)
        feats = sf.features_from_osm(OSM)
        pts = features_to_point_targets(feats, ElevationGrid.flat(100.0),
                                        density_per_m2=0.02, rng=rng)
        assert pts.num > 5
        assert pts.rcs.min() > 0


class TestWorld:
    def test_build_and_export(self, tmp_path):
        sf = SceneFetcher(0.0, 0.0, radius_m=120.0)
        feats = sf.features_from_osm(OSM)
        meshes = world.build_world(feats, ElevationGrid.flat(120.0, 4))
        names = [m.name for m in meshes]
        assert names[0] == "terrain" and any("building" in n for n in names)
        obj = world.export_obj(str(tmp_path / "scene.obj"), meshes)
        txt = open(obj).read()
        assert "usemtl building" in txt and txt.count("v ") > 10
        assert os.path.exists(str(tmp_path / "scene.mtl"))

    def test_extrude_counts(self):
        v, f = world.extrude_polygon(np.array([(0, 0), (1, 0), (1, 1), (0, 1)]),
                                     5.0)
        assert v.shape == (8, 3)
        # 2 roof + 8 wall triangles
        assert f.shape == (10, 3)
        assert v[:, 2].max() == 5.0

    def test_strip_mesh(self):
        v, f = world.strip_mesh(np.array([(0, 0), (10, 0), (20, 0)]), 4.0)
        assert v.shape == (6, 3)
        assert f.shape == (4, 3)
        np.testing.assert_allclose(np.abs(v[:, 1]).max(), 2.0)


class TestFirstPersonRuntime:
    def _world(self):
        from nis_sar_amtigmti_video_tpu.viz import world_runtime
        return world_runtime.demo_world(n_grid=12)

    def test_dual_terrain_split(self):
        xs = np.linspace(-10, 10, 5)
        z = np.full((5, 5), 5.0)
        z[:2, :2] = -2.0                       # a water corner
        meshes = world.dual_terrain_mesh(ElevationGrid(xs, xs.copy(), z))
        byname = {m.name: m for m in meshes}
        assert set(byname) == {"terrain", "water"}
        # water cells are flattened to z=0, land keeps elevation
        assert np.all(byname["water"].vertices[byname["water"].faces][..., 2]
                      == 0.0)
        land_z = byname["terrain"].vertices[byname["terrain"].faces][..., 2]
        assert land_z.max() == 5.0
        # 16 cells, 2 tris each; 1 cell mean < 1 m -> water
        assert byname["water"].faces.shape[0] == 2
        assert byname["terrain"].faces.shape[0] == 30

    def test_movement_and_bindings(self):
        w = self._world()
        p0 = w.camera.position.copy()
        w.step(1.0, held={"w"})
        assert np.linalg.norm(w.camera.position - p0) == pytest.approx(
            w.speed, rel=1e-6)
        w.step(0.5, held={"left"})
        assert w.camera.yaw != 0.0
        w.press("1")                           # reset binding
        np.testing.assert_allclose(w.camera.position, p0)
        w.press("f")
        assert w.fullscreen
        w.press("escape")
        assert not w.alive

    def test_ground_clamp(self):
        w = self._world()
        w.camera.position = np.array([0.0, 0.0, 2.0])
        w.step(5.0, held={"e"})                # fly down hard
        g = float(w.elevation.elevation_at(*w.camera.position[:2]))
        assert w.camera.position[2] >= g + 1.0 - 1e-9

    def test_render_moves_the_view(self):
        w = self._world()
        a = w.render_array(figsize=(3, 2), dpi=60)
        assert a.shape == (120, 180, 3) and a.dtype == np.uint8
        w.step(1.5, held={"w"})
        w.step(1.0, held={"left"})
        b = w.render_array(figsize=(3, 2), dpi=60)
        assert (a != b).mean() > 0.01          # the view actually changed

    def test_fly_sequence_gif(self, tmp_path):
        from nis_sar_amtigmti_video_tpu.viz import world_runtime
        w = self._world()
        gif = str(tmp_path / "fly.gif")
        frames = world_runtime.fly_sequence(
            w, [("w", 0.5), ("w+left", 0.5), ("q", 0.5)], path=gif)
        assert frames.shape[0] == 3 and os.path.exists(gif)

    def test_run_loop_agg_headless(self):
        # under Agg run() renders one frame and returns without blocking
        w = self._world()
        w.run(max_seconds=0.1)
        assert w.alive
