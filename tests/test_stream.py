"""Streaming fetch + progress reporting (reference index.js:238-317)."""
import numpy as np

from splatjax.io import save_splat, synthetic_scene
from splatjax.io.splat_format import ROW_LENGTH
from splatjax.io.stream import StreamProgress, stream_chunks
from splatjax.viewer import SplatRenderer


def _asset(tmp_path, n=100):
    scene = synthetic_scene(n, seed=3)
    p = tmp_path / "scene.splat"
    save_splat(str(p), scene)
    return p, scene


def test_stream_chunks_path_with_progress(tmp_path):
    p, scene = _asset(tmp_path)
    events = []
    data = b"".join(
        stream_chunks(str(p), chunk_size=1024, progress=events.append)
    )
    assert len(data) == 100 * ROW_LENGTH
    assert events[-1].done
    assert events[-1].bytes_read == len(data)
    # Content-Length analogue: local files know their total up front
    assert all(e.total_bytes == len(data) for e in events)
    fr = [e.fraction for e in events]
    assert fr == sorted(fr) and fr[-1] == 1.0
    assert events[-1].mbps >= 0.0
    assert "%" in str(events[0])


def test_stream_chunks_file_url(tmp_path):
    p, _ = _asset(tmp_path)
    url = p.as_uri()                       # file:///...
    data = b"".join(stream_chunks(url, chunk_size=512))
    assert len(data) == 100 * ROW_LENGTH


def test_stream_chunks_file_object_unknown_total(tmp_path):
    p, _ = _asset(tmp_path)

    class NoSeek:
        def __init__(self, f):
            self._f = f

        def read(self, n):
            return self._f.read(n)

    events = []
    with open(p, "rb") as f:
        data = b"".join(
            stream_chunks(NoSeek(f), chunk_size=640, progress=events.append)
        )
    assert len(data) == 100 * ROW_LENGTH
    assert events[0].total_bytes is None and events[0].fraction is None
    assert "B" in str(events[0])           # falls back to byte count


def test_renderer_streamed_load_matches_direct(tmp_path):
    p, scene = _asset(tmp_path)
    events = []
    r = SplatRenderer(src=str(p), progress=events.append)
    assert r.scene.num_gaussians == 100
    np.testing.assert_allclose(np.asarray(r.scene.means),
                               np.asarray(scene.means), atol=2e-2)
    assert events and events[-1].done


def test_renderer_streamed_load_respects_max_splats(tmp_path):
    p, _ = _asset(tmp_path)
    r = SplatRenderer(src=str(p), max_splats=40)
    assert r.scene.num_gaussians == 40


def test_progress_event_math():
    e = StreamProgress(bytes_read=5_000_000, total_bytes=10_000_000,
                       seconds=2.0)
    assert e.fraction == 0.5
    assert abs(e.mbps - 20.0) < 1e-9
