"""High-level scene API — the analogue of the A-Frame component layer (L5).

The reference's entire user surface is four declarative properties
(index.js:2-7):  src, cutoutEntity, pixelRatio, xrPixelRatio.
:class:`SplatRenderer` mirrors that "few knobs, sane defaults" surface on
top of the TPU pipeline, adding what a training framework needs (capacity,
exactness toggles) with the same defaults philosophy (SURVEY.md §5 config).

    renderer = SplatRenderer(src="scene.splat", pixel_ratio=0.5)
    img = renderer.render(make_camera((0, 0, 3), (0, 0, 0),
                                      width=1920, height=1080))

Progressive loading (the reference's streaming ingest, index.js:259-303) is
exposed via :meth:`SplatRenderer.feed` / :meth:`from_stream`: push byte
chunks as they arrive and render the splats loaded so far.
"""
from __future__ import annotations

import dataclasses
from typing import Iterable, Optional

import jax
import numpy as np

from splatjax.camera import Camera
from splatjax.io.ply_format import parse_ply_bytes
from splatjax.io.splat_format import ROW_LENGTH, parse_splat_bytes
from splatjax.render import default_capacity, render
from splatjax.scene import GaussianScene

Array = jax.Array

# The reference caps capacity at MAX_TEXTURE_SIZE^2 splats (index.js:30-36).
# Our analogue bounds the duplicated-instance buffer instead; this cap
# bounds *splats* for parity of behavior (excess rows are truncated).
DEFAULT_MAX_SPLATS = 16384 * 16384


def _concat_scenes(parts: list[GaussianScene]) -> GaussianScene:
    if len(parts) == 1:
        return parts[0]
    return GaussianScene(
        means=np.concatenate([np.asarray(p.means) for p in parts]),
        scales=np.concatenate([np.asarray(p.scales) for p in parts]),
        quats=np.concatenate([np.asarray(p.quats) for p in parts]),
        colors=np.concatenate([np.asarray(p.colors) for p in parts]),
        opacities=np.concatenate([np.asarray(p.opacities) for p in parts]),
        sh=None,
    )


@dataclasses.dataclass
class SplatRenderer:
    """Load-and-render surface mirroring the reference component schema.

    Args:
      src: path to a .splat or .ply asset (like the ``src`` property).
      scene: alternatively, an in-memory GaussianScene.
      cutout: optional (4, 4) world->unit-box matrix (``cutoutEntity``:
        the inverse of the cutout box's world matrix, index.js:443-448).
      pixel_ratio: resolution scale applied to render calls (``pixelRatio``,
        index.js:10-12): 0.5 renders at half resolution and upsamples
        nothing — the returned image is simply smaller.
      max_splats: capacity truncation like MAX_TEXTURE_SIZE^2
        (index.js:30-36, 329-335).
      capacity / alpha_clip / early_stop / viewer_exact / tile_size:
        TPU pipeline knobs (see splatjax.render.render).
    """

    src: Optional[str] = None
    scene: Optional[GaussianScene] = None
    cutout: Optional[Array] = None
    pixel_ratio: float = 1.0
    xr_pixel_ratio: float = 0.5
    max_splats: int = DEFAULT_MAX_SPLATS
    capacity: Optional[int] = None
    alpha_clip: object = "auto"  # float | None | "auto" (see render())
    early_stop: float = 1e-4
    viewer_exact: bool = False
    feature_bytes: object = "auto"  # 16 | 32 | "auto" (see render())
    tile_size: int = 16
    background: Optional[Array] = None
    progress: Optional[object] = None  # callback(StreamProgress)
    resort_interval: int = 1

    def __post_init__(self):
        self._pending = b""
        self._parts: list[GaussianScene] = []
        self._fed = 0  # splats parsed from feed() so far (capped)
        self._bins = None            # cached tile index (resort_interval>1)
        self._bins_key = None        # (scene OBJECT, w, h) the cache is for
        self._frames_since_sort = 0
        if self.src is not None:
            # streamed load with progress reporting, exactly like the
            # reference's fetch loop (index.js:238-303): .splat rows are
            # ingested progressively as chunks arrive; .ply is buffered
            # whole then converted (index.js:305-317). src may be a local
            # path or a file:// / http(s):// URL.
            from splatjax.io.stream import stream_chunks

            if str(self.src).split("?")[0].endswith(".ply"):
                data = b"".join(
                    stream_chunks(self.src, progress=self.progress)
                )
                self.scene = parse_ply_bytes(data)
            else:
                for chunk in stream_chunks(self.src, progress=self.progress):
                    self.feed(chunk)
                self._materialize()
        if self.scene is not None and self.scene.num_gaussians > self.max_splats:
            self.scene = jax.tree_util.tree_map(
                lambda x: x[: self.max_splats], self.scene
            )

    # -- progressive ingest (index.js:259-303) --------------------------
    def feed(self, chunk: bytes) -> int:
        """Push raw .splat bytes; returns splats loaded so far.

        Amortized O(rows in chunk): each chunk is parsed once into a part
        list; parts are concatenated lazily (and cached) when ``scene`` is
        next read. Bytes past ``max_splats`` are discarded unparsed, like
        the reference's maxVertexes truncation (index.js:329-335).
        """
        base = self.scene.num_gaussians if self.scene is not None else 0
        budget = self.max_splats - base - self._fed
        if budget <= 0:
            return base + self._fed
        self._pending += chunk
        n_rows = min(len(self._pending) // ROW_LENGTH, budget)
        if n_rows:
            whole = self._pending[: n_rows * ROW_LENGTH]
            self._pending = self._pending[n_rows * ROW_LENGTH:]
            self._parts.append(parse_splat_bytes(whole))
            self._fed += n_rows
        return base + self._fed

    def _materialize(self) -> None:
        """Fold pending feed() parts into ``scene`` (cached until next feed)."""
        if not self._parts:
            return
        parts = ([self.scene] if self.scene is not None else []) + self._parts
        self.scene = _concat_scenes(parts)
        self._parts = []
        self._fed = 0  # folded into scene — budget now counts from there

    @classmethod
    def from_stream(cls, chunks: Iterable[bytes], **kw) -> "SplatRenderer":
        r = cls(**kw)
        for c in chunks:
            r.feed(c)
        return r

    # -- rendering -------------------------------------------------------
    def render(self, camera: Camera, xr: bool = False, **overrides) -> Array:
        """Render; ``xr=True`` applies xr_pixel_ratio instead of pixel_ratio
        (the reference's XR framebuffer scale, index.js:13-15, default 0.5).
        """
        self._materialize()
        if self.scene is None or self.scene.num_gaussians == 0:
            raise ValueError("no scene loaded (src/scene/feed)")
        ratio = self.xr_pixel_ratio if xr else self.pixel_ratio
        if ratio != 1.0:
            camera = Camera(
                modelview=camera.modelview,
                projection=camera.projection,
                width=max(int(camera.width * ratio), 1),
                height=max(int(camera.height * ratio), 1),
            )
        if self.resort_interval > 1:
            if not overrides:
                return self._render_stale_order(camera)
            # overrides force the exact per-frame path (the cached tile
            # index cannot honor arbitrary render() kwargs); surface the
            # semantics change instead of silently ignoring resort_interval
            import warnings

            warnings.warn(
                "SplatRenderer.render(**overrides) bypasses the cached "
                "stale-order tile index (resort_interval ignored): "
                f"exact per-frame sort used for {sorted(overrides)}",
                stacklevel=2,
            )
        kw = dict(
            tile_size=self.tile_size,
            capacity=self.capacity,
            alpha_clip=self.alpha_clip,
            early_stop=self.early_stop,
            viewer_exact=self.viewer_exact,
            feature_bytes=self.feature_bytes,
            cutout=self.cutout,
            background=self.background,
        )
        kw.update(overrides)
        return render(self.scene, camera, **kw)

    def _render_stale_order(self, camera: Camera) -> Array:
        """Frame with a possibly-stale tile index — the analogue of the
        reference reusing the worker's previous sorted order while a new
        sort is in flight (sortReady backpressure, index.js:439-453, 206).

        The index is rebuilt every ``resort_interval`` frames (and whenever
        the scene or viewport changes); projection and shading are always
        current-frame. Interval 1 == exact per-frame sort.
        """
        from splatjax.render import bin_scene, render_binned

        # The key holds the scene OBJECT (compared with `is`), not id():
        # CPython recycles ids, so a freed-then-reallocated scene could
        # silently reuse stale bins — holding the reference pins the id.
        # feed()/_materialize() always build a NEW GaussianScene, so any
        # scene mutation through the API changes identity.
        key = (self.scene, camera.width, camera.height)
        if (
            self._bins is None
            or self._bins_key is None
            or self._bins_key[0] is not key[0]
            or self._bins_key[1:] != key[1:]
            or self._frames_since_sort >= self.resort_interval
        ):
            self._bins = bin_scene(
                self.scene, camera,
                tile_size=self.tile_size, capacity=self.capacity,
                viewer_exact=self.viewer_exact, cutout=self.cutout,
                early_stop=self.early_stop, cache_params=True,
            )
            self._bins_key = key
            self._frames_since_sort = 0
        self._frames_since_sort += 1
        return render_binned(
            self.scene, camera, self._bins,
            tile_size=self.tile_size, alpha_clip=self.alpha_clip,
            early_stop=self.early_stop, viewer_exact=self.viewer_exact,
            feature_bytes=self.feature_bytes,
            cutout=self.cutout, background=self.background,
        )
