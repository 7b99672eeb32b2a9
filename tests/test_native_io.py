"""Native runtime tier + product IO round trips."""

import os

import numpy as np
import pytest

import nis_sar_amtigmti_video_tpu as nst
from nis_sar_amtigmti_video_tpu import native
from nis_sar_amtigmti_video_tpu.io import products


class TestNative:
    def test_builds(self):
        assert native.available(), "g++ toolchain should be present here"

    def test_rle_matches_fallback(self, rng):
        cov = rng.random(1000) > 0.6
        got = native.rle_stats(cov, 1.5)
        # compute fallback by temporarily hiding the lib
        lib, native._lib = native._lib, None
        tried, native._tried = native._tried, True
        try:
            want = native.rle_stats(cov, 1.5)
        finally:
            native._lib, native._tried = lib, tried
        np.testing.assert_allclose(got, want)

    def test_rle_edge_cases(self):
        assert native.rle_stats(np.ones(5, bool), 1.0)[0] == 1.0
        assert native.rle_stats(np.zeros(5, bool), 1.0)[0] == 0.0
        assert native.rle_stats(np.zeros(0, bool), 1.0)[0] == 0.0

    def test_per_sat_access(self):
        valid = np.zeros((10, 3), np.uint8)
        valid[2:5, 0] = 1
        valid[7, 2] = 1
        counts, first = native.per_sat_access(valid, 2.0)
        np.testing.assert_allclose(counts, [6.0, 0.0, 2.0])
        np.testing.assert_allclose(first, [4.0, -1.0, 14.0])

    def test_spiller_roundtrip(self, tmp_path):
        arrs = [np.random.randn(32, 16).astype(np.complex64) * (1 + 1j)
                for _ in range(6)]
        with native.FrameSpiller(3) as sp:
            for i, a in enumerate(arrs):
                sp.submit(str(tmp_path / f"x_{i}.npy"), a)
            sp.wait()
            assert sp.errors == 0
        for i, a in enumerate(arrs):
            np.testing.assert_allclose(np.load(tmp_path / f"x_{i}.npy"), a)

    def test_spiller_float_and_1d(self, tmp_path):
        with native.FrameSpiller(1) as sp:
            sp.submit(str(tmp_path / "f.npy"), np.arange(11, dtype=np.float32))
            sp.submit(str(tmp_path / "g.npy"),
                      np.ones((2, 3, 4), np.float32))
        np.testing.assert_allclose(np.load(tmp_path / "f.npy"), np.arange(11))
        assert np.load(tmp_path / "g.npy").shape == (2, 3, 4)


class TestProductIO:
    def test_video_frames_async(self, tmp_path):
        frames = (np.random.randn(5, 16, 16)
                  + 1j * np.random.randn(5, 16, 16)).astype(np.complex64)
        d = str(tmp_path / "frames")
        products.write_video_frames(d, frames, async_spill=True)
        idx, back = products.read_video_frames(d)
        np.testing.assert_allclose(back, frames, rtol=1e-6)
        assert products.missing_frames(d, 5) == []

    def test_missing_and_resume(self, tmp_path):
        frames = np.zeros((4, 8, 8), np.complex64)
        d = str(tmp_path / "frames")
        products.write_video_frames(d, frames)
        os.remove(os.path.join(d, "frame_00001.npy"))
        os.remove(os.path.join(d, "frame_00003.npy"))
        assert products.missing_frames(d, 4) == [1, 3]
        assert products.missing_frames(str(tmp_path / "nowhere"), 3) == [0, 1, 2]


class TestOrbaxCheckpoint:
    def test_roundtrip_complex(self, tmp_path):
        from nis_sar_amtigmti_video_tpu.io.checkpoint import RunCheckpointer
        ck = RunCheckpointer(str(tmp_path / "ckpt"), max_to_keep=2)
        slc = (np.random.randn(2, 8, 8)
               + 1j * np.random.randn(2, 8, 8)).astype(np.complex64)
        ck.save(0, {"frames": slc, "meta": {"done": np.array([0, 1])}})
        ck.save(1, {"frames": slc * 2, "meta": {"done": np.array([0, 1, 2])}})
        assert ck.latest_step() == 1
        back = ck.restore()
        np.testing.assert_allclose(back["frames"], slc * 2, rtol=1e-6)
        assert back["meta"]["done"].tolist() == [0, 1, 2]
        np.testing.assert_allclose(ck.restore(0)["frames"], slc, rtol=1e-6)
        ck.close()
