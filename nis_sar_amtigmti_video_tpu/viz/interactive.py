"""Interactive matplotlib viewers — widget parity with the reference.

The reference ships four interactive viewers (step browser with dB/linear
radio buttons, per-step zoom memory, zoom-adaptive clim; the ATI/DPCA viewer
adds a phase-mask slider, auto-balance button and printed zoom statistics).
These classes reproduce that interaction model on top of the headless
helpers in viz/render.py. They work with any matplotlib backend; under Agg
the callbacks are still wired, so tests can drive them programmatically.

Both viewers open the *same npz schemas the reference viewers read*
(io/products.py writers), so either tool can inspect either pipeline's
output.
"""

from __future__ import annotations

import numpy as np

from nis_sar_amtigmti_video_tpu.viz import render


class PipelineViewer:
    """Step browser: raw -> range comp -> RD -> RCMC -> image
    (behavioral port of sar_interactive_viewer.py / sar_satellite_viewer.py).
    """

    STEP_KEYS = [("raw_phist", "Raw phase history"),
                 ("range_comp", "Range compressed"),
                 ("rd_map", "Range-Doppler"),
                 ("rd_rcmc", "RCMC corrected"),
                 ("rd_az_comp", "Azimuth compressed"),
                 ("final_image", "Focused image")]

    def __init__(self, npz_path: str):
        import matplotlib.pyplot as plt
        from matplotlib.widgets import Button, RadioButtons

        z = np.load(npz_path)
        self.steps = [(title, np.abs(np.asarray(z[k])))
                      for k, title in self.STEP_KEYS
                      if k in z and np.asarray(z[k]).ndim == 2]
        if not self.steps:
            raise ValueError(f"no pipeline arrays in {npz_path}")
        self.index = 0
        self.scale = "db"
        self.zoom_memory = [None] * len(self.steps)

        self.fig, self.ax = plt.subplots(figsize=(11, 8))
        self.fig.subplots_adjust(left=0.2, bottom=0.15)
        self.im = None

        ax_radio = self.fig.add_axes([0.02, 0.45, 0.13, 0.12])
        self.radio = RadioButtons(ax_radio, ("db", "linear"))
        self.radio.on_clicked(self.set_scale)
        ax_prev = self.fig.add_axes([0.25, 0.03, 0.12, 0.06])
        ax_next = self.fig.add_axes([0.40, 0.03, 0.12, 0.06])
        self.b_prev = Button(ax_prev, "< prev step")
        self.b_next = Button(ax_next, "next step >")
        self.b_prev.on_clicked(lambda _:  self.set_step(self.index - 1))
        self.b_next.on_clicked(lambda _: self.set_step(self.index + 1))
        self.ax.callbacks.connect("xlim_changed", self._on_zoom)
        self.ax.callbacks.connect("ylim_changed", self._on_zoom)
        self.draw()

    # -- interaction model --
    def set_step(self, idx: int):
        self.zoom_memory[self.index] = (self.ax.get_xlim(), self.ax.get_ylim())
        self.index = int(np.clip(idx, 0, len(self.steps) - 1))
        self.draw()

    def set_scale(self, label: str):
        self.scale = label
        self.draw()

    def _visible(self):
        """Data subset inside the current axes — the zoom-adaptive clim
        behavior (sar_interactive_viewer.py:156-219)."""
        _, data = self.steps[self.index]
        x0, x1 = sorted(self.ax.get_xlim())
        y0, y1 = sorted(self.ax.get_ylim())
        h, w = data.shape
        c0, c1 = int(np.clip(x0, 0, w - 1)), int(np.clip(x1, 1, w))
        r0, r1 = int(np.clip(y0, 0, h - 1)), int(np.clip(y1, 1, h))
        sub = data[r0:max(r1, r0 + 1), c0:max(c1, c0 + 1)]
        return sub if sub.size else data

    def _on_zoom(self, _ax):
        if self.im is None:
            return
        sub = self._visible()
        d = render.to_db(sub) if self.scale == "db" else sub
        self.im.set_clim(*render.percentile_clim(d))
        self.fig.canvas.draw_idle()

    def draw(self):
        title, data = self.steps[self.index]
        d = render.to_db(data) if self.scale == "db" else data
        vmin, vmax = render.percentile_clim(d)
        self.ax.clear()
        self.im = self.ax.imshow(d, aspect="auto", origin="lower",
                                 cmap="viridis", vmin=vmin, vmax=vmax)
        self.ax.set_title(f"[{self.index+1}/{len(self.steps)}] {title} "
                          f"({self.scale})")
        mem = self.zoom_memory[self.index]
        if mem is not None:
            self.ax.set_xlim(*mem[0])
            self.ax.set_ylim(*mem[1])
        self.fig.canvas.draw_idle()

    def show(self):
        import matplotlib.pyplot as plt
        plt.show()


class AtiDpcaViewer:
    """Seven-product ATI/DPCA browser with phase-mask slider, auto-balance
    and zoom statistics (behavioral port of sar_ati_dcpa_viewer_csa.py)."""

    def __init__(self, npz_path: str):
        import matplotlib.pyplot as plt
        from matplotlib.widgets import Button, RadioButtons, Slider

        z = np.load(npz_path)
        # reference stores SLCs as (range, azimuth)
        self.slc1 = np.asarray(z["slc1"]).T
        self.slc2 = np.asarray(z["slc2"]).T
        self.mask_threshold = 0.05
        self.balanced = False
        self.product = "ch1_mag"
        self._recompute()

        self.fig, self.ax = plt.subplots(figsize=(11, 8))
        self.fig.subplots_adjust(left=0.24, bottom=0.16)
        ax_radio = self.fig.add_axes([0.02, 0.35, 0.17, 0.3])
        self.radio = RadioButtons(ax_radio, tuple(self.products))
        self.radio.on_clicked(self.set_product)
        ax_slider = self.fig.add_axes([0.3, 0.05, 0.4, 0.03])
        self.slider = Slider(ax_slider, "phase mask", 0.0, 0.5,
                             valinit=self.mask_threshold)
        self.slider.on_changed(self.set_mask)
        ax_bal = self.fig.add_axes([0.78, 0.035, 0.15, 0.06])
        self.b_balance = Button(ax_bal, "Auto-Balance")
        self.b_balance.on_clicked(lambda _: self.auto_balance())
        self.im = None
        self.draw()

    def _recompute(self):
        s1, s2 = self.slc1, self.slc2
        diff = s1 - s2
        self.products = {
            "ch1_mag": np.abs(s1),
            "ch2_mag": np.abs(s2),
            "ch1_phase": np.angle(s1),
            "ch2_phase": np.angle(s2),
            "dpca_mag": np.abs(diff),
            "dpca_phase": np.angle(diff),
            "ati_phase": render.masked_phase_display(s1, s2,
                                                     self.mask_threshold),
        }
        self.stats = render.region_stats(s1, diff)

    def set_product(self, name: str):
        self.product = name
        self.draw()

    def set_mask(self, value: float):
        self.mask_threshold = float(value)
        self._recompute()
        self.draw()

    def auto_balance(self):
        """angle(mean(slc1 conj(slc2))) applied to channel 2
        (sar_ati_dcpa_viewer_csa.py:245-254)."""
        cal = np.angle(np.mean(self.slc1 * np.conj(self.slc2)))
        self.slc2 = self.slc2 * np.exp(1j * cal)
        self.balanced = True
        self._recompute()
        self.draw()
        return cal

    def zoom_stats(self):
        """Printed zoom statistics incl. cancellation ratio."""
        return self.stats

    def draw(self):
        data = self.products[self.product]
        self.ax.clear()
        if "phase" in self.product:
            self.im = self.ax.imshow(data, aspect="auto", origin="lower",
                                     cmap="hsv", vmin=-np.pi, vmax=np.pi)
        else:
            d = render.to_db(data)
            vmax = float(np.percentile(d, 99.9))
            self.im = self.ax.imshow(d, aspect="auto", origin="lower",
                                     cmap="bone", vmin=vmax - 40, vmax=vmax)
        tag = " (balanced)" if self.balanced else ""
        self.ax.set_title(
            f"{self.product}{tag} — cancellation "
            f"{self.stats['cancellation_db']:.1f} dB")
        self.fig.canvas.draw_idle()

    def show(self):
        import matplotlib.pyplot as plt
        plt.show()


class MovingScenarioViewer:
    """Comparative browser over the 5-scenario moving-target set with one
    shared zoom (behavioral port of sar_satellite_moving_viewer.py:10-278).

    The reference loads five fixed npz files (stationary + 0/45/90/135 deg
    at 15 m/s, :11-17), keeps a single zoom rectangle shared by every
    scenario (:144-171), re-clims to the visible subset (1-99 percentile in
    dB, [0, max] linear), and offers a 3D geometry mode that draws the ship
    velocity vector. Works under Agg; callbacks are drivable in tests.
    """

    LABELS = [("Stationary", "stationary"),
              ("Moving 0\N{DEGREE SIGN}", "0deg"),
              ("Moving 45\N{DEGREE SIGN}", "45deg"),
              ("Moving 90\N{DEGREE SIGN}", "90deg"),
              ("Moving 135\N{DEGREE SIGN}", "135deg")]

    @classmethod
    def scenario_paths(cls, directory: str):
        """(label, path) for every scenario file present; accepts both the
        reference's names (sar_satellite_moving_scen_0deg.npz) and this
        package's writer names (..._moving_0deg.npz)."""
        import os
        found = []
        for label, tag in cls.LABELS:
            for stem in (f"sar_satellite_moving_scen_{tag}.npz",
                         f"sar_satellite_moving_scen_moving_{tag}.npz"):
                path = os.path.join(directory, stem)
                if os.path.exists(path):
                    found.append((label, path))
                    break
        return found

    def __init__(self, directory: str):
        import matplotlib.pyplot as plt
        from matplotlib.widgets import Button, RadioButtons

        self.scenarios = self.scenario_paths(directory)
        if not self.scenarios:
            raise ValueError(f"no moving-scenario npz files in {directory}")
        self.data = [np.load(p) for _, p in self.scenarios]
        self.index = 0
        self.scale = "db"
        self.geo_mode = False
        self.shared_zoom = None          # ONE zoom for all scenarios
        self._guard = False

        self.fig = plt.figure(figsize=(14, 8))
        ax_radio = self.fig.add_axes([0.02, 0.5, 0.16, 0.3])
        self.radio = RadioButtons(ax_radio,
                                  tuple(lb for lb, _ in self.scenarios))
        self.radio.on_clicked(self.set_scenario_label)
        ax_scale = self.fig.add_axes([0.02, 0.32, 0.16, 0.12])
        self.radio_scale = RadioButtons(ax_scale, ("db", "linear"))
        self.radio_scale.on_clicked(self.set_scale)
        ax_geo = self.fig.add_axes([0.02, 0.2, 0.16, 0.07])
        self.b_geo = Button(ax_geo, "Geometry view")
        self.b_geo.on_clicked(lambda _: self.toggle_geometry())
        self.ax = self.fig.add_axes([0.26, 0.1, 0.7, 0.82])
        self.im = None
        self.draw()

    # -- data helpers --
    def _extent(self, z):
        ra, cr = np.asarray(z["range_axis"]), np.asarray(z["cross_range"])
        return [float(ra[0]), float(ra[-1]), float(cr[0]), float(cr[-1])]

    def _visible(self, z, xlim, ylim):
        """Subset of final_image inside world-coordinate limits
        (the reference's get_visible_stats, :111-142)."""
        img = np.abs(np.asarray(z["final_image"]))
        x0, x1, y0, y1 = self._extent(z)
        rows, cols = img.shape
        a0, a1 = sorted(xlim)
        b0, b1 = sorted(ylim)
        c0 = int(np.clip((a0 - x0) / (x1 - x0 + 1e-9) * cols, 0, cols - 1))
        c1 = int(np.clip((a1 - x0) / (x1 - x0 + 1e-9) * cols, c0 + 1, cols))
        r0 = int(np.clip((b0 - y0) / (y1 - y0 + 1e-9) * rows, 0, rows - 1))
        r1 = int(np.clip((b1 - y0) / (y1 - y0 + 1e-9) * rows, r0 + 1, rows))
        return img[r0:r1, c0:c1]

    def geometry_summary(self, idx: int | None = None) -> dict:
        """Scenario geometry the 3D view draws (incl. ship velocity)."""
        z = self.data[self.index if idx is None else idx]
        return {
            "scenario": str(np.asarray(z["scen_name"])),
            "orbit_alt_m": float(z["orbit_alt"]),
            "look_angle_deg": float(z["look_ang"]),
            "incidence_angle_deg": float(z["inc_ang"]),
            "slant_range_m": float(z["r0"]),
            "ship_speed_mps": float(z["ship_speed"]),
            "ship_heading_deg": float(z["ship_heading"]),
            "ship_vel_mps": np.asarray(z["ship_vel"]).tolist(),
        }

    # -- interaction model --
    def set_scenario_label(self, label: str):
        for i, (lb, _) in enumerate(self.scenarios):
            if lb == label:
                self.set_scenario(i)
                return

    def set_scenario(self, idx: int):
        self.index = int(np.clip(idx, 0, len(self.scenarios) - 1))
        self.draw()                       # shared_zoom re-applied in draw()

    def set_scale(self, label: str):
        self.scale = label
        self.draw()

    def toggle_geometry(self):
        self.geo_mode = not self.geo_mode
        self.draw()

    def _on_zoom(self, _ax):
        if self.im is None or self.geo_mode or self._guard:
            return
        self.shared_zoom = (self.ax.get_xlim(), self.ax.get_ylim())
        self._update_clim()
        self.fig.canvas.draw_idle()

    def _update_clim(self):
        z = self.data[self.index]
        sub = self._visible(z, self.ax.get_xlim(), self.ax.get_ylim())
        if sub.size == 0:
            return
        if self.scale == "db":
            d = render.to_db(sub)
            self.im.set_clim(*render.percentile_clim(d))
        else:
            self.im.set_clim(0.0, float(sub.max()))

    def _draw_geometry(self):
        self.ax.remove()
        self.ax = self.fig.add_axes([0.26, 0.1, 0.7, 0.82], projection="3d")
        info = self.geometry_summary()
        r0 = info["slant_range_m"]
        inc = np.radians(info["incidence_angle_deg"])
        sat = np.array([0.0, -r0 * np.sin(inc), r0 * np.cos(inc)])
        self.ax.plot([sat[0]], [sat[1]], [sat[2]], "r^", markersize=10)
        self.ax.plot([0.0, sat[0]], [0.0, sat[1]], [0.0, sat[2]], "y--")
        v = np.asarray(info["ship_vel_mps"], float)
        if np.linalg.norm(v) > 0:
            s = 0.15 * r0 / max(np.linalg.norm(v), 1e-9)
            self.ax.quiver(0, 0, 0, v[0] * s, v[1] * s, v[2] * s, color="c")
        self.ax.set_title(
            f"{info['scenario']}: ship {info['ship_speed_mps']:.0f} m/s @ "
            f"{info['ship_heading_deg']:.0f}\N{DEGREE SIGN}, "
            f"look {info['look_angle_deg']:.1f}\N{DEGREE SIGN}")

    def draw(self):
        if self.geo_mode:
            self._draw_geometry()
            self.fig.canvas.draw_idle()
            return
        if self.ax.name == "3d":
            self.ax.remove()
            self.ax = self.fig.add_axes([0.26, 0.1, 0.7, 0.82])
        label, _ = self.scenarios[self.index]
        z = self.data[self.index]
        img = np.abs(np.asarray(z["final_image"]))
        d = render.to_db(img) if self.scale == "db" else img
        ext = self._extent(z)
        self._guard = True
        self.ax.clear()
        self.im = self.ax.imshow(d, aspect="auto", origin="lower",
                                 cmap="viridis", extent=ext)
        self.ax.set_xlabel("Range (m)")
        self.ax.set_ylabel("Cross range (m)")
        self.ax.set_title(f"Satellite SAR: {label} ({self.scale})")
        if self.shared_zoom is not None:
            self.ax.set_xlim(*self.shared_zoom[0])
            self.ax.set_ylim(*self.shared_zoom[1])
        self._guard = False
        self._update_clim()
        self.ax.callbacks.connect("xlim_changed", self._on_zoom)
        self.ax.callbacks.connect("ylim_changed", self._on_zoom)
        self.fig.canvas.draw_idle()

    def show(self):
        import matplotlib.pyplot as plt
        plt.show()
