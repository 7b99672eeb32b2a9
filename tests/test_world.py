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
        assert feats[0].material["dielectric"] == 4.0  # reference building class

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


class TestPlacements:
    """Scene-model placement registry (sar_scene_data.py:73-128) and its
    simulation/world bridges."""

    def test_registry_matches_reference(self):
        from nis_sar_amtigmti_video_tpu.scene.materials import (
            SCENE_PLACEMENTS)
        names = [p.name for p in SCENE_PLACEMENTS]
        assert names == ["F-35B Lightning II", "Boeing 787-8",
                         "Civilian Car", "Main Battle Tank", "Small Boat",
                         "Navy Frigate"]
        by = {p.name: p for p in SCENE_PLACEMENTS}
        assert by["F-35B Lightning II"].position_m == (0.0, 200.0)
        assert by["F-35B Lightning II"].height_offset_m == 45.0
        assert by["F-35B Lightning II"].material == "stealth_coating"
        assert by["Navy Frigate"].position_m == (-70.0, 600.0)
        assert by["Navy Frigate"].heading_deg == 145.0
        assert by["Main Battle Tank"].rotation_deg == (-90.0, -35.0, 0.0)

    def test_materials_taxonomy_breadth(self):
        from nis_sar_amtigmti_video_tpu.scene.materials import (
            MATERIALS, material_rcs_factor)
        # reference landcover + coating classes all present with their
        # radar constants (sar_scene_data.py:9-69)
        assert MATERIALS["ocean"]["dielectric"] == 80.0
        assert MATERIALS["ocean"]["roughness"] == 0.02
        assert MATERIALS["wetland"]["dielectric"] == 40.0
        assert MATERIALS["railway"]["dielectric"] == 1000.0
        assert MATERIALS["parking"]["roughness"] == 0.3
        assert MATERIALS["stealth_coating"]["dielectric"] == 2.5
        assert MATERIALS["aluminum"]["roughness"] == 0.1
        assert MATERIALS["ship_metal"]["dielectric"] == 1000.0
        assert len(MATERIALS) >= 46
        # RCS factors order correctly by material class
        assert material_rcs_factor("aluminum") > 0.8
        assert material_rcs_factor("stealth_coating") < 0.05
        assert (material_rcs_factor("steel_armor")
                < material_rcs_factor("aluminum"))

    def test_placement_targets_bridge(self):
        from nis_sar_amtigmti_video_tpu.scene.materials import (
            SCENE_PLACEMENTS, material_rcs_factor, placement_targets)
        from nis_sar_amtigmti_video_tpu.scene import targets as T

        elev = ElevationGrid(np.array([-1000.0, 1000.0]),
                             np.array([-1000.0, 1000.0]),
                             np.array([[2.0, 2.0], [2.0, 2.0]]))
        tg = placement_targets(elevation=elev)
        # six models concatenated; every scatterer near its placement
        start = 0
        for pl in SCENE_PLACEMENTS:
            n = {"f35": len(T.f35().rcs), "airliner": len(T.airliner().rcs),
                 "car": len(T.car().rcs), "tank": len(T.tank().rcs),
                 "boat": len(T.car().rcs),
                 "frigate": len(T.destroyer().rcs)}[pl.model]
            seg = tg.positions[start:start + n]
            c = seg.mean(axis=0)
            assert abs(c[0] - pl.position_m[0]) < 120.0
            assert abs(c[1] - pl.position_m[1]) < 120.0
            # terrain (2 m) + height offset
            assert seg[:, 2].min() >= pl.height_offset_m + 2.0 - 3.0
            start += n
        assert start == tg.num
        # stealth coating crushes the F-35 RCS vs the aluminum airliner
        f35_rcs = tg.rcs[:len(T.f35().rcs)].sum()
        air_rcs = tg.rcs[len(T.f35().rcs):
                         len(T.f35().rcs) + len(T.fighter_jet().rcs)].sum()
        assert f35_rcs < 0.05 * air_rcs
        assert np.isclose(
            f35_rcs,
            T.f35().total_rcs * material_rcs_factor("stealth_coating"))

    def test_placement_meshes_render(self, tmp_path):
        meshes = world.placement_meshes()
        assert len(meshes) == 12          # hull + studs per placement
        hull = meshes[0]
        assert hull.material == "stealth_coating"
        assert hull.vertices[:, 2].min() >= 44.0   # height offset honored
        out = world.export_obj(str(tmp_path / "placed.obj"), meshes)
        assert os.path.exists(out)


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
