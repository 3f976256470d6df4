"""Geometry/event rendering: offline snapshots and an interactive
viewer (parity: chroma/camera.py).

The reference runs a pygame event loop in a forked process with the
CUDA render kernel per frame (reference: chroma/camera.py Camera).
Here rendering goes through the MBVH render op; the interactive pygame
viewer is optional (headless environments can use ``snapshot`` /
``render_to_image`` to produce PNG frames), and ``EventViewer`` colors
detector channels by charge/time from simulated events.
"""
import os

import numpy as np

from chroma_tpu import gpu
from chroma_tpu.ops.render import GPURays, render
from chroma_tpu.tools import from_film
from chroma_tpu.transform import normalize
from chroma_tpu.log import logger


def pixels_to_rgb_array(pixels, size):
    """(N,) uint32 ARGB -> (height, width, 3) uint8 image array."""
    pixels = np.asarray(pixels, dtype=np.uint32)
    rgb = np.stack([(pixels >> 16) & 0xFF, (pixels >> 8) & 0xFF,
                    pixels & 0xFF], axis=-1).astype(np.uint8)
    # rays are generated pixel-major (x fastest inner loop = y)
    return rgb.reshape(size[0], size[1], 3).transpose(1, 0, 2)[::-1]


class Camera(object):
    """Renders a geometry from a movable viewpoint.

    Non-interactive use:
        cam = Camera(geometry, size=(800, 600))
        img = cam.render_to_image()           # PIL image
        cam.snapshot('out.png')
    Interactive use (needs a display): cam.run() — pygame loop with
    rotate/zoom via mouse + arrow keys.
    """

    def __init__(self, geometry, size=(800, 600), device_id=None,
                 alpha_depth=10):
        self.geometry = geometry
        self.size = size
        self.alpha_depth = alpha_depth

        if hasattr(geometry, 'num_channels'):
            self.gpu_geometry = gpu.GPUDetector(geometry)
        else:
            self.gpu_geometry = gpu.GPUGeometry(geometry)

        lower, upper = geometry.mesh.get_bounds()
        self.scale = np.linalg.norm(upper - lower)
        self.mesh_center = 0.5 * (lower + upper)
        self.viewpoint = self.mesh_center + \
            np.array([0.0, -self.scale, 0.0])
        self.axis1 = np.array([0.0, 0.0, 1.0])
        self.axis2 = np.array([1.0, 0.0, 0.0])
        self._update_rays()

    def _update_rays(self):
        pos, dir = from_film(self.viewpoint, axis1=self.axis1,
                             axis2=self.axis2, size=self.size,
                             width=35.0, focal_length=18.0)
        self.rays = GPURays(pos, dir, max_alpha_depth=self.alpha_depth)

    # ---- transforms --------------------------------------------------

    def translate(self, v):
        self.viewpoint = self.viewpoint + v
        self.rays.translate(v)

    def rotate(self, phi, n):
        self.rays.rotate_around_point(phi, n, self.mesh_center)
        self.viewpoint = np.asarray(
            self.rays.pos.mean(axis=0))  # approximate

    # ---- rendering ---------------------------------------------------

    def render_pixels(self):
        return self.rays.snapshot(self.gpu_geometry,
                                  alpha_depth=self.alpha_depth)

    def render_to_array(self):
        return pixels_to_rgb_array(self.render_pixels(), self.size)

    def render_to_image(self):
        from PIL import Image
        return Image.fromarray(self.render_to_array())

    def snapshot(self, filename):
        self.render_to_image().save(filename)
        logger.info('wrote %s', filename)
        return filename

    # ---- interactive loop --------------------------------------------

    def run(self):
        """pygame interactive loop (reference: chroma/camera.py:646)."""
        os.environ.setdefault('SDL_VIDEODRIVER',
                              os.environ.get('SDL_VIDEODRIVER', ''))
        import pygame
        pygame.init()
        screen = pygame.display.set_mode(self.size)
        pygame.display.set_caption('chroma-tpu camera')
        clock = pygame.time.Clock()

        done = False
        while not done:
            for ev in pygame.event.get():
                if ev.type == pygame.QUIT:
                    done = True
                elif ev.type == pygame.KEYDOWN:
                    if ev.key == pygame.K_ESCAPE:
                        done = True
                    elif ev.key == pygame.K_LEFT:
                        self.rotate(np.pi / 18, self.axis1)
                    elif ev.key == pygame.K_RIGHT:
                        self.rotate(-np.pi / 18, self.axis1)
                    elif ev.key == pygame.K_UP:
                        self.translate(0.1 * self.scale * normalize(
                            self.mesh_center - self.viewpoint))
                    elif ev.key == pygame.K_DOWN:
                        self.translate(-0.1 * self.scale * normalize(
                            self.mesh_center - self.viewpoint))
                elif ev.type == pygame.MOUSEMOTION and ev.buttons[0]:
                    dx, dy = ev.rel
                    self.rotate(-dx * 0.005, self.axis1)
                    self.rotate(-dy * 0.005, self.axis2)

            arr = self.render_to_array()
            surf = pygame.surfarray.make_surface(
                arr.transpose(1, 0, 2)[:, ::-1])
            screen.blit(surf, (0, 0))
            pygame.display.flip()
            clock.tick(30)
        pygame.quit()


class EventViewer(Camera):
    """Camera that steps through simulated events, coloring hit PMTs
    by charge or time (reference: chroma/camera.py:720)."""

    def __init__(self, geometry, events, size=(800, 600), **kwargs):
        Camera.__init__(self, geometry, size=size, **kwargs)
        self.events = list(events)
        self.event_index = 0
        if self.events:
            self.color_by_event(self.events[0])

    def color_by_event(self, ev, mode='charge'):
        """Recolor PMT solids by the event's channel charge/time."""
        if ev.channels is None:
            return
        from matplotlib import cm
        chan = ev.channels
        nsolids = len(self.geometry.solid_id_to_channel_index)
        solid_hit = np.zeros(nsolids, dtype=bool)
        colors = np.zeros(nsolids, dtype=np.uint32)
        values = chan.q if mode == 'charge' else chan.t
        vrange = values[chan.hit]
        if len(vrange) == 0:
            return
        lo, hi = vrange.min(), max(vrange.max(), vrange.min() + 1e-9)
        cmap = cm.get_cmap('jet') if hasattr(cm, 'get_cmap') else \
            __import__('matplotlib').colormaps['jet']
        for ci, sid in enumerate(self.geometry.channel_index_to_solid_id):
            if chan.hit[ci]:
                frac = float((values[ci] - lo) / (hi - lo))
                r, g, b, _ = cmap(frac)
                solid_hit[sid] = True
                colors[sid] = (int(r * 255) << 16) | (int(g * 255) << 8) \
                    | int(b * 255)
        self.gpu_geometry.color_solids(solid_hit, colors)

    def next_event(self):
        self.event_index = (self.event_index + 1) % len(self.events)
        self.color_by_event(self.events[self.event_index])


def view(obj, size=(800, 600), **kwargs):
    """Convenience: build a camera for any geometry-ish object and run
    interactively if possible, else snapshot (reference:
    chroma/camera.py view)."""
    from chroma_tpu.loader import create_geometry_from_obj
    geometry = create_geometry_from_obj(obj)
    cam = Camera(geometry, size=size, **kwargs)
    if os.environ.get('DISPLAY') or os.environ.get(
            'SDL_VIDEODRIVER') not in (None, '', 'dummy'):
        cam.run()
    else:
        cam.snapshot('chroma_camera.png')
    return cam
