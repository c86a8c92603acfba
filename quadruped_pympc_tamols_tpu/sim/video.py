"""Offscreen video recording of simulation episodes.

Counterpart of the reference's viewer-bound recorder (simulation/video_recorder.py:
17-207: 'V'-key toggled 1920x1080@30fps MP4 capture from the interactive MuJoCo
viewer) plus its debug overlays (quadruped_utils.py:25-98: GRF arrows and foothold
markers drawn into the viewer scene). This build is headless-first, so recording is
driven programmatically from the episode loop: an offscreen ``mujoco.Renderer``
captures at a fixed fps and frames are encoded to MP4 (imageio/ffmpeg) or GIF, with
the same GRF/foothold overlays injected as scene geoms.

Requires a GL backend (set ``MUJOCO_GL=egl`` or ``osmesa`` on headless machines);
:func:`rendering_available` probes for one so callers and tests can gate cleanly.
"""
from __future__ import annotations

import time

import numpy as np


def rendering_available() -> bool:
    """True if an offscreen MuJoCo renderer can be created in this process."""
    try:
        import mujoco

        xml = "<mujoco><worldbody><light pos='0 0 3'/></worldbody></mujoco>"
        m = mujoco.MjModel.from_xml_string(xml)
        r = mujoco.Renderer(m, 64, 64)
        r.close()
        return True
    except Exception:
        return False


def draw_overlays(scene, env, wrapper):
    """Inject the debug overlays into a MuJoCo scene: GRF arrows at stance feet,
    blue foothold markers, green swing-target markers (reference
    quadruped_utils.py:25-98 + simulation.py:713-764). Works on both an offscreen
    Renderer's scene and a live viewer's ``user_scn`` (callers reset
    ``user_scn.ngeom`` to the model count before each sync)."""
    import mujoco

    if wrapper is None:
        return

    def add_marker(kind, pos, size, rgba):
        if scene.ngeom >= scene.maxgeom:
            return
        g = scene.geoms[scene.ngeom]
        mujoco.mjv_initGeom(g, kind, np.asarray(size, np.float64),
                            np.asarray(pos, np.float64), np.eye(3).flatten(),
                            np.asarray(rgba, np.float32))
        scene.ngeom += 1

    grfs = getattr(wrapper, "nmpc_GRFs", None)
    feet = env.feet_pos()
    if grfs is not None:
        for leg in range(4):
            f = np.asarray(grfs.data)[leg]
            p0 = np.asarray(feet.data)[leg]
            p1 = p0 + f / 500.0  # N -> m arrow length
            if np.linalg.norm(f) > 1.0 and scene.ngeom < scene.maxgeom:
                g = scene.geoms[scene.ngeom]
                mujoco.mjv_initGeom(g, mujoco.mjtGeom.mjGEOM_ARROW,
                                    np.zeros(3), np.zeros(3), np.eye(3).flatten(),
                                    np.array([1, 0.2, 0.2, 0.8], np.float32))
                mujoco.mjv_connector(g, mujoco.mjtGeom.mjGEOM_ARROW, 0.005, p0, p1)
                scene.ngeom += 1
    fh = getattr(wrapper, "nmpc_footholds", None)
    if fh is not None:
        for leg in range(4):
            add_marker(mujoco.mjtGeom.mjGEOM_SPHERE, np.asarray(fh.data)[leg],
                       [0.02, 0, 0], [0.2, 0.4, 1.0, 0.7])
    wb = getattr(wrapper, "wb_interface", None)
    if wb is not None:
        # Swing tracking targets (only meaningful for swing legs).
        des = np.asarray(wb.last_des_foot_pos.data)
        for leg in range(4):
            if wb.current_contact[leg] == 0:
                add_marker(mujoco.mjtGeom.mjGEOM_SPHERE, des[leg],
                           [0.012, 0, 0], [0.2, 1.0, 0.3, 0.8])


class VideoRecorder:
    """Fixed-fps offscreen episode recorder with GRF/foothold overlays.

    Args:
        env: QuadrupedEnv (sim/mujoco_env.py) — provides model/data.
        path: output file; '.mp4' needs an ffmpeg-enabled imageio, '.gif' always
            works. A '%d'-style placeholder is filled with the episode index.
        fps: capture rate (reference records at 30 fps, video_recorder.py:17-30).
        width/height: frame size (reference 1920x1080; default smaller for tests).
    """

    def __init__(self, env, path: str, fps: float = 30.0, width: int = 640,
                 height: int = 480, camera: str | int = -1):
        import mujoco

        self.env = env
        self.path = path
        self.fps = fps
        self.renderer = mujoco.Renderer(env.model, height, width)
        self.camera = camera
        self.frames: list[np.ndarray] = []
        self._next_t = 0.0
        self._t0 = None

    # -- capture --------------------------------------------------------------
    def maybe_capture(self, sim_time: float, wrapper=None) -> bool:
        """Capture a frame if the fps clock has advanced; returns True if captured."""
        if sim_time + 1e-9 < self._next_t:
            return False
        self._next_t = sim_time + 1.0 / self.fps
        if self._t0 is None:
            self._t0 = time.time()
        if isinstance(self.camera, str) or self.camera >= 0:
            self.renderer.update_scene(self.env.data, camera=self.camera)
        else:
            self.renderer.update_scene(self.env.data)
        draw_overlays(self.renderer.scene, self.env, wrapper)
        self.frames.append(self.renderer.render().copy())
        return True

    def close(self, episode: int = 0) -> str | None:
        """Encode and write the captured frames; returns the written path."""
        if not self.frames:
            self.renderer.close()
            return None
        path = self.path % episode if "%" in self.path else self.path
        import imageio

        try:
            imageio.mimwrite(path, self.frames, fps=self.fps)
        except Exception:
            # No ffmpeg plugin: fall back to GIF next to the requested path.
            path = path.rsplit(".", 1)[0] + ".gif"
            imageio.mimwrite(path, self.frames, fps=self.fps)
        self.renderer.close()
        self.frames = []
        return path
