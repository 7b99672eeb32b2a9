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
