"""Interactive first-person world runtime — the live counterpart of
``sar_simulator_ursina.py``.

The reference runs a first-person fly-through of the fetched scene in the
Ursina game engine (``sar_simulator_ursina.py:211-243``): ``wasd`` movement
with mouse look, ``q``/``e`` vertical fly (:225-230), ``escape`` quit /
``f`` fullscreen / ``1`` reset-position bindings (:232-243), a directional
light with ambient fill (:218-222), land/water dual terrain meshes split at
1 m elevation (:39-112), buildings as lit boxes, road tubes, and draped
polygons.

Ursina needs a GPU window and is not in this environment, so the runtime
here is self-contained: a vectorized software renderer (perspective
projection, near-plane clipping, painter's algorithm, Lambert shading with
the reference's directional+ambient lighting) drawn through matplotlib.
With any GUI backend :meth:`FirstPersonWorld.run` is a live first-person
engine (key handlers + animation timer); under Agg the same engine is
driven programmatically (:meth:`step` / :meth:`render_array`), which is how
the tests fly it headless.

Controls (reference parity):
  w/a/s/d  move in the heading plane       q/e    fly up / down
  arrows   look (yaw/pitch — the keyboard stand-in for mouse look)
  1        reset position                  f      toggle fullscreen
  escape   quit
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple

import numpy as np

from nis_sar_amtigmti_video_tpu.scene.materials import ElevationGrid
from nis_sar_amtigmti_video_tpu.viz.world import Mesh

# Reference lighting: DirectionalLight rotation=(45, -45, 45) with a dim
# AmbientLight (sar_simulator_ursina.py:218-222). In our z-up frame that
# direction is "from the south-east, 45 degrees up".
_LIGHT_DIR = np.array([1.0, -1.0, 1.0]) / np.sqrt(3.0)
_AMBIENT = 0.35


@dataclass
class Camera:
    """Fly camera: position in world metres (z up), yaw/pitch in radians.

    yaw 0 looks along +y (north); yaw increases clockwise (to the right);
    pitch positive looks up."""

    position: np.ndarray = field(
        default_factory=lambda: np.array([0.0, 0.0, 100.0]))
    yaw: float = 0.0
    pitch: float = -0.35
    fov_deg: float = 75.0

    def basis(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(right, up, forward) unit vectors of the view frame."""
        cy, sy = np.cos(self.yaw), np.sin(self.yaw)
        cp, sp = np.cos(self.pitch), np.sin(self.pitch)
        fwd = np.array([sy * cp, cy * cp, sp])
        right = np.array([cy, -sy, 0.0])
        up = np.cross(fwd, right)
        if up[2] < 0:
            up = -up
        return right, up, fwd

    def heading(self) -> Tuple[np.ndarray, np.ndarray]:
        """Horizontal (forward, right) for wasd movement — fly-mode moves in
        the heading plane regardless of pitch, like the reference's
        FirstPersonController."""
        cy, sy = np.cos(self.yaw), np.sin(self.yaw)
        return np.array([sy, cy, 0.0]), np.array([cy, -sy, 0.0])


def _shade(tris: np.ndarray, base_rgb: np.ndarray) -> np.ndarray:
    """Per-face Lambert shading (double-sided, like Ursina's unlit-but-
    edge-shaded cubes read visually): ambient + diffuse |n . L|."""
    e1 = tris[:, 1] - tris[:, 0]
    e2 = tris[:, 2] - tris[:, 0]
    n = np.cross(e1, e2)
    norm = np.linalg.norm(n, axis=1, keepdims=True)
    n = n / np.where(norm == 0, 1.0, norm)
    lam = np.abs(n @ _LIGHT_DIR)
    k = (_AMBIENT + (1.0 - _AMBIENT) * lam)[:, None]
    return np.clip(base_rgb * k, 0.0, 1.0)


class FirstPersonWorld:
    """Software-rendered first-person fly-through over a mesh world.

    Parameters mirror the reference controller (`speed=50`, gravity off,
    start high at (0, 100, 0) — ursina's y-up (0, 100, 0) is our z-up
    (0, 0, 100); sar_simulator_ursina.py:211-216).
    """

    QUIT_KEY = "escape"

    def __init__(self, meshes: Sequence[Mesh],
                 elevation: Optional[ElevationGrid] = None,
                 speed: float = 50.0, look_rate_dps: float = 90.0,
                 start: Tuple[float, float, float] = (0.0, 0.0, 100.0),
                 fov_deg: float = 75.0, near_m: float = 0.5,
                 max_draw_m: float = 6000.0):
        self.meshes = list(meshes)
        self.elevation = elevation
        self.speed = float(speed)
        self.look_rate = np.deg2rad(look_rate_dps)
        self.start = np.asarray(start, np.float64)
        self.near = float(near_m)
        self.max_draw = float(max_draw_m)
        self.camera = Camera(position=self.start.copy(), fov_deg=fov_deg)
        self.fullscreen = False
        self.alive = True
        self._held: set = set()
        # flatten the world once: (F, 3, 3) triangles + (F, 3) shaded colors
        tri_list, col_list = [], []
        for m in self.meshes:
            if m.faces.shape[0] == 0:
                continue
            t = m.vertices[m.faces]
            tri_list.append(t)
            col_list.append(_shade(t, np.asarray(m.color, np.float64)))
        if tri_list:
            self.tris = np.concatenate(tri_list)
            self.colors = np.concatenate(col_list)
        else:
            self.tris = np.zeros((0, 3, 3))
            self.colors = np.zeros((0, 3))

    # ------------------------------------------------------------------
    # simulation: held keys -> camera motion (reference update(), :225-230)
    # ------------------------------------------------------------------

    def press(self, key: str) -> None:
        self._held.add(key)
        self.handle_key(key)

    def release(self, key: str) -> None:
        self._held.discard(key)

    def handle_key(self, key: str) -> None:
        """One-shot bindings (reference input(), :232-243)."""
        if key == self.QUIT_KEY:
            self.alive = False
        elif key == "f":
            self.fullscreen = not self.fullscreen
        elif key == "1":
            self.camera.position = self.start.copy()

    def step(self, dt: float, held: Optional[set] = None) -> None:
        """Advance the fly camera by ``dt`` seconds of held-key input."""
        keys = self._held if held is None else set(held)
        cam = self.camera
        fwd, right = cam.heading()
        v = np.zeros(3)
        if "w" in keys:
            v += fwd
        if "s" in keys:
            v -= fwd
        if "d" in keys:
            v += right
        if "a" in keys:
            v -= right
        if "q" in keys:
            v += np.array([0.0, 0.0, 1.0])
        if "e" in keys:
            v -= np.array([0.0, 0.0, 1.0])
        n = np.linalg.norm(v)
        if n > 0:
            cam.position = cam.position + v / n * self.speed * dt
        if "left" in keys:
            cam.yaw -= self.look_rate * dt
        if "right" in keys:
            cam.yaw += self.look_rate * dt
        if "up" in keys:
            cam.pitch += self.look_rate * dt
        if "down" in keys:
            cam.pitch -= self.look_rate * dt
        cam.pitch = float(np.clip(cam.pitch, -1.45, 1.45))
        # never fly below the local ground (mesh colliders in the reference)
        if self.elevation is not None:
            g = float(self.elevation.elevation_at(cam.position[0],
                                                  cam.position[1]))
            cam.position[2] = max(cam.position[2], g + 1.0)

    # ------------------------------------------------------------------
    # rendering: project -> clip -> painter sort -> PolyCollection
    # ------------------------------------------------------------------

    def _visible_polys(self):
        """Camera-space projection with near-plane clipping. Returns
        (polys_2d list, colors, depths) ready for painter drawing."""
        cam = self.camera
        right, up, fwd = cam.basis()
        rel = self.tris - cam.position          # (F, 3, 3)
        x = rel @ right
        y = rel @ up
        z = rel @ fwd                           # view depth
        zmean = z.mean(axis=1)
        cand = (z.max(axis=1) > self.near) & (zmean < self.max_draw)
        if not np.any(cand):
            return [], np.zeros((0, 3)), np.zeros(0)
        x, y, z = x[cand], y[cand], z[cand]
        cols = self.colors[cand]
        zmean = zmean[cand]
        f = 1.0 / np.tan(np.deg2rad(cam.fov_deg) / 2.0)

        fully = z.min(axis=1) > self.near
        polys, out_cols, out_z = [], [], []
        # vectorized path: triangles fully in front
        if np.any(fully):
            px = f * x[fully] / z[fully]
            py = f * y[fully] / z[fully]
            pts = np.stack([px, py], axis=-1)   # (K, 3, 2)
            on = (np.abs(pts) < 4.0).any(axis=(1, 2))  # generous frustum cull
            for p in pts[on]:
                polys.append(p)
            out_cols.append(cols[fully][on])
            out_z.append(zmean[fully][on])
        # straddling triangles: clip against z = near (few, loop is fine)
        for i in np.nonzero(~fully)[0]:
            poly = []
            vx, vy, vz = x[i], y[i], z[i]
            for a in range(3):
                b = (a + 1) % 3
                ina, inb = vz[a] > self.near, vz[b] > self.near
                if ina:
                    poly.append((vx[a], vy[a], vz[a]))
                if ina != inb:
                    t = (self.near - vz[a]) / (vz[b] - vz[a])
                    poly.append((vx[a] + t * (vx[b] - vx[a]),
                                 vy[a] + t * (vy[b] - vy[a]), self.near))
            if len(poly) >= 3:
                p = np.asarray(poly)
                polys.append(np.stack([f * p[:, 0] / p[:, 2],
                                       f * p[:, 1] / p[:, 2]], axis=-1))
                out_cols.append(cols[i][None])
                out_z.append(np.array([zmean[i]]))
        if not polys:
            return [], np.zeros((0, 3)), np.zeros(0)
        colors = np.concatenate(out_cols)
        depth = np.concatenate(out_z)
        return polys, colors, depth

    def draw(self, ax) -> None:
        """Render the current view into a matplotlib axes."""
        from matplotlib.collections import PolyCollection

        ax.clear()
        ax.set_facecolor("0.5")                 # window.color = gray (:14)
        polys, colors, depth = self._visible_polys()
        if polys:
            order = np.argsort(-depth)          # far -> near (painter)
            pc = PolyCollection([polys[i] for i in order],
                                facecolors=colors[order],
                                edgecolors=colors[order] * 0.85,
                                linewidths=0.3)
            ax.add_collection(pc)
        ax.set_xlim(-1.0, 1.0)
        ax.set_ylim(-0.75, 0.75)
        ax.set_aspect("equal")
        ax.set_axis_off()
        p = self.camera.position
        ax.text(0.02, 0.97, f"({p[0]:.0f}, {p[1]:.0f}, {p[2]:.0f}) m   "
                f"yaw {np.rad2deg(self.camera.yaw):.0f}\N{DEGREE SIGN}",
                transform=ax.transAxes, fontsize=8, color="w", va="top")

    def render_array(self, figsize=(8, 6), dpi=100) -> np.ndarray:
        """Render the current view to an RGB uint8 array (headless path)."""
        import matplotlib
        import matplotlib.pyplot as plt

        fig = plt.figure(figsize=figsize, dpi=dpi)
        ax = fig.add_axes([0, 0, 1, 1])
        self.draw(ax)
        fig.canvas.draw()
        buf = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
        plt.close(fig)
        return buf

    # ------------------------------------------------------------------
    # live loop (GUI backends)
    # ------------------------------------------------------------------

    def run(self, fps: float = 30.0, max_seconds: Optional[float] = None):
        """Open a live window and fly. Returns after quit (escape), window
        close, or ``max_seconds`` of wall time (useful for demos/tests)."""
        import matplotlib
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(9, 7))
        try:
            fig.canvas.manager.set_window_title("SAR world (first person)")
        except Exception:
            pass
        fig.canvas.mpl_connect(
            "key_press_event", lambda e: e.key and self.press(e.key))
        fig.canvas.mpl_connect(
            "key_release_event", lambda e: e.key and self.release(e.key))
        dt = 1.0 / fps
        elapsed = 0.0
        self.draw(ax)
        interactive = matplotlib.get_backend().lower() != "agg"
        while self.alive and plt.fignum_exists(fig.number):
            self.step(dt)
            self.draw(ax)
            if interactive:
                plt.pause(dt)
            elapsed += dt
            if max_seconds is not None and elapsed >= max_seconds:
                break
            if not interactive and max_seconds is None:
                break                           # Agg: single frame, no loop
        plt.close(fig)
        return self


def fly_sequence(world: FirstPersonWorld, script: Sequence[Tuple[str, float]],
                 path: Optional[str] = None, fps: float = 10.0,
                 figsize=(6, 4.5), dpi=80) -> np.ndarray:
    """Fly a scripted route headless: ``script`` is [(keys, seconds), ...]
    with keys like ``"w"`` or ``"w+left"``; one frame is rendered per step.
    Returns the (N, H, W, 3) uint8 frame stack; writes an animated GIF when
    ``path`` is given (the headless stand-in for the live window)."""
    frames = []
    for keys, seconds in script:
        held = set(k for k in keys.split("+") if k)
        world.step(seconds, held=held)
        frames.append(world.render_array(figsize=figsize, dpi=dpi))
    stack = np.stack(frames)
    if path is not None:
        from PIL import Image
        imgs = [Image.fromarray(f) for f in stack]
        imgs[0].save(path, save_all=True, append_images=imgs[1:],
                     duration=int(1000 / fps), loop=0)
    return stack


def demo_world(size_m: float = 400.0, n_grid: int = 24,
               seed: int = 0) -> FirstPersonWorld:
    """Self-contained demo scene (procedural fallback terrain + a few
    buildings/roads) mirroring the reference's no-network fallback
    (sar_simulator_ursina.py:25-29)."""
    from nis_sar_amtigmti_video_tpu.scene.materials import SceneFeature
    from nis_sar_amtigmti_video_tpu.viz.world import build_world

    from nis_sar_amtigmti_video_tpu.viz.world import dual_terrain_mesh

    rng = np.random.default_rng(seed)
    xs = np.linspace(-size_m, size_m, n_grid)
    ys = np.linspace(-size_m, size_m, n_grid)
    gx, gy = np.meshgrid(xs, ys, indexing="xy")
    z = 3.0 + 8.0 * np.exp(-((gx - 120) ** 2 + (gy + 80) ** 2)
                           / (2 * 150.0 ** 2))
    z -= 9.0 * np.exp(-((gx + 200) ** 2 + (gy - 150) ** 2) / (2 * 90.0 ** 2))
    elev = ElevationGrid(xs=xs, ys=ys, z=z)
    feats = []
    for i in range(6):
        cx, cy = rng.uniform(-size_m * 0.6, size_m * 0.6, 2)
        w, d = rng.uniform(12, 30, 2)
        h = float(rng.uniform(8, 35))
        sq = np.array([[cx - w, cy - d], [cx + w, cy - d],
                       [cx + w, cy + d], [cx - w, cy + d]])
        feats.append(SceneFeature(kind="building", polygon_m=sq, height_m=h))
    road = np.column_stack([np.linspace(-size_m, size_m, 16),
                            40.0 * np.sin(np.linspace(0, 3, 16))])
    feats.append(SceneFeature(kind="road", polygon_m=road, height_m=0.0))
    # reference-style dual land/water terrain + feature meshes draped on it
    meshes = dual_terrain_mesh(elev, water_threshold=1.0)
    meshes += build_world(feats, elevation=elev, water_level=None)[1:]
    return FirstPersonWorld(meshes, elevation=elev)
