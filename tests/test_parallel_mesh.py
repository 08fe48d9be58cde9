"""Production mesh extract vs serial shard loop: byte identity.

run_extract_mesh processes n temporal spans simultaneously on an
n-device mesh (8 virtual CPU devices here).  Its promise is that the
shard files it writes are byte-identical to a serial ``--n-shards n``
loop — same trajectories, features, images and scene-change files —
so the merge stage and everything downstream cannot tell the paths
apart (VERDICT r1 next-step #4).
"""
import filecmp
import json
import os

import pytest

pytestmark = pytest.mark.slow

import numpy as np

import jax

from facerec_tpu.config import ExtractConfig, MergeConfig
from facerec_tpu.parallel.extract_mesh import run_extract_mesh
from facerec_tpu.parallel.mesh import frame_mesh
from facerec_tpu.pipeline.extract import run_extract
from facerec_tpu.pipeline.merge import run_merge
from facerec_tpu.video.synth import PureScriptedDetector, make_clip
from tests.test_extract_e2e import StubEmbedderBank

N_DEV = 4


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("mesh") / "125261-MeshFilm.mp4")
    return make_clip(path, n_frames=70, cuts=(30,), seed=21)


def _tree_bytes(root):
    """relative path → bytes for every file under root."""
    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            rel = os.path.relpath(p, root)
            with open(p, "rb") as fh:
                out[rel] = fh.read()
    return out


@pytest.fixture(scope="module")
def both_runs(clip, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("runs")
    cfg = ExtractConfig(block_frames=16, max_detections=8, max_tracks=16)

    out_serial = str(tmp / "serial")
    for i in range(N_DEV):
        scfg = ExtractConfig(n_shards=N_DEV, shard_i=i, block_frames=16,
                             max_detections=8, max_tracks=16)
        run_extract(clip.path, scfg, out_serial,
                    detector=PureScriptedDetector(clip, max_detections=8),
                    embedders=StubEmbedderBank())

    out_mesh = str(tmp / "mesh")
    mesh = frame_mesh(jax.devices()[:N_DEV])
    counters = run_extract_mesh(
        clip.path, cfg, out_mesh, mesh=mesh,
        detector=PureScriptedDetector(clip, max_detections=8),
        embedders=StubEmbedderBank())
    return out_serial, out_mesh, counters


def test_mesh_writes_byte_identical_shard_files(both_runs):
    out_serial, out_mesh, counters = both_runs
    assert len(counters) == N_DEV
    assert sum(c.frames_processed for c in counters) >= 70

    for sub in ("trajectories", "features", "scene_changes", "images"):
        a = _tree_bytes(f"{out_serial}/125261-data/{sub}")
        b = _tree_bytes(f"{out_mesh}/125261-data/{sub}")
        assert set(a) == set(b), (sub, set(a) ^ set(b))
        for rel in a:
            assert a[rel] == b[rel], f"{sub}/{rel} differs"


def test_mesh_run_report_has_phase_breakdown(both_runs):
    """The mesh loop writes the same per-phase wall-time keys as the
    serial loop (SURVEY §5.5) — the tool needed to tune a
    transfer-bound mesh host.  VERDICT r3 weak #6."""
    _, out_mesh, _ = both_runs
    rep = json.load(open(f"{out_mesh}/125261-data/run_report.json"))
    (stage,) = [k for k in rep if k.startswith("extract_mesh_")]
    c = rep[stage]["counters"]
    for p in ("decode", "encode", "dispatch", "upload", "fetch",
              "consume", "flush_dispatch"):
        assert f"{p}_seconds" in c, p
        assert c[f"{p}_seconds"] >= 0
    # phases actually accumulated (sub-ms phases round to 0.0 on a
    # tiny CPU run, but decode wall time is always visible)
    assert c["decode_seconds"] > 0
    assert c["spans"] == N_DEV


def test_mesh_merge_matches_serial_and_unsharded(both_runs, clip,
                                                 tmp_path):
    """Merged mesh output is byte-identical to merged serial-shard
    output, and content-equivalent to an unsharded single run (whose
    merged file ORDER legitimately differs: expiry order vs
    shard-merge order)."""
    out_serial, out_mesh, _ = both_runs
    cfg = MergeConfig(min_face_size=20)
    run_merge(f"{out_mesh}/125261-data", 125261, cfg)
    run_merge(f"{out_serial}/125261-data", 125261, cfg)

    for name in ("trajectories.jsonl", "features.jsonl",
                 "scene_changes.json"):
        with open(f"{out_mesh}/125261-data/{name}", "rb") as f:
            got = f.read()
        with open(f"{out_serial}/125261-data/{name}", "rb") as f:
            want = f.read()
        assert got == want, name

    out_one = str(tmp_path / "one")
    run_extract(clip.path,
                ExtractConfig(block_frames=16, max_detections=8,
                              max_tracks=16),
                out_one,
                detector=PureScriptedDetector(clip, max_detections=8),
                embedders=StubEmbedderBank())
    run_merge(f"{out_one}/125261-data", 125261, cfg)

    def trajs(p):
        out = [json.loads(l) for l in open(p)]
        assert out, p
        return sorted(out, key=lambda t: (t["start"], t["len"]))

    got = trajs(f"{out_mesh}/125261-data/trajectories.jsonl")
    want = trajs(f"{out_one}/125261-data/trajectories.jsonl")
    assert len(got) == len(want)
    for a, b in zip(got, want):
        assert (a["start"], a["len"]) == (b["start"], b["len"])
        # Kalman re-initialization at stitched span boundaries moves
        # posterior boxes by a pixel or two (same tolerance as
        # test_extract_e2e.test_shard_vs_unsharded)
        np.testing.assert_allclose(a["bbs"], b["bbs"], atol=2)
    sc_mesh = json.load(open(f"{out_mesh}/125261-data/scene_changes.json"))
    sc_one = json.load(open(f"{out_one}/125261-data/scene_changes.json"))
    assert sc_mesh == sc_one == {"frame_indices": [30],
                                 "movie_id": 125261}


def test_mesh_crash_resume_byte_identical(clip, both_runs, tmp_path,
                                          monkeypatch):
    """A mesh run killed mid-film resumes from its per-span checkpoints
    to byte-identical shard files (VERDICT r2 next-step #4)."""
    import facerec_tpu.parallel.extract_mesh as em

    _, out_mesh_clean, _ = both_runs
    out = str(tmp_path / "crashmesh")
    real_open = em.open_block_reader
    n_created = [0]

    def flaky_open(*a, **kw):
        r = real_open(*a, **kw)
        idx = n_created[0]
        n_created[0] += 1
        if idx == 1:                      # sabotage span 1's reader
            real_blocks = r.blocks

            def blocks(beg, end, block):
                for k, item in enumerate(real_blocks(beg, end, block)):
                    if k == 1:
                        raise RuntimeError("injected mesh crash")
                    yield item

            r.blocks = blocks
        return r

    cfg = ExtractConfig(block_frames=16, max_detections=8, max_tracks=16,
                        checkpoint_every_blocks=1)
    mesh = frame_mesh(jax.devices()[:N_DEV])
    monkeypatch.setattr(em, "open_block_reader", flaky_open)
    with pytest.raises(RuntimeError, match="injected mesh crash"):
        run_extract_mesh(
            clip.path, cfg, out, mesh=mesh,
            detector=PureScriptedDetector(clip, max_detections=8),
            embedders=StubEmbedderBank())
    monkeypatch.setattr(em, "open_block_reader", real_open)
    assert any(f.endswith(".ckpt")
               for f in os.listdir(f"{out}/125261-data"))

    counters = run_extract_mesh(
        clip.path, cfg, out, mesh=mesh,
        detector=PureScriptedDetector(clip, max_detections=8),
        embedders=StubEmbedderBank())
    assert counters  # at least the crashed span re-ran

    for sub in ("trajectories", "features", "scene_changes", "images"):
        a = _tree_bytes(f"{out_mesh_clean}/125261-data/{sub}")
        b = _tree_bytes(f"{out}/125261-data/{sub}")
        assert set(a) == set(b), (sub, set(a) ^ set(b))
        for rel in a:
            assert a[rel] == b[rel], f"{sub}/{rel} differs"
    # no stale checkpoints; all spans marked done
    files = os.listdir(f"{out}/125261-data")
    assert not any(f.endswith(".ckpt") for f in files)
    assert sum(f.endswith(".done") for f in files) == N_DEV

    # a third run skips every span
    counters = run_extract_mesh(
        clip.path, cfg, out, mesh=mesh,
        detector=PureScriptedDetector(clip, max_detections=8),
        embedders=StubEmbedderBank())
    assert counters == []


def test_mesh_more_devices_than_frames(tmp_path):
    """n_frames < span_len·(n-1): trailing spans are empty and must
    produce no inverted shard files (ADVICE r2)."""
    from facerec_tpu.video.synth import make_clip as mc

    path = str(tmp_path / "5-Tiny.mp4")
    tiny = mc(path, n_frames=21, cuts=(), seed=2)
    mesh = frame_mesh(jax.devices()[:4])
    cfg = ExtractConfig(block_frames=8, max_detections=8, max_tracks=16,
                        save_images=False)
    counters = run_extract_mesh(
        path, cfg, str(tmp_path / "out"), mesh=mesh,
        detector=PureScriptedDetector(tiny, max_detections=8),
        embedders=StubEmbedderBank())
    assert sum(c.frames_processed for c in counters) >= 21
    names = os.listdir(f"{tmp_path}/out/5-data/trajectories")
    for n in names:
        beg, end = n.rsplit("_", 1)[1].split(".")[0].split("-")
        assert int(beg) < int(end), n


def test_pure_scripted_detector_paths_agree(clip):
    """The pure (mesh) and host (serial) protocols of
    PureScriptedDetector return the same detections."""
    import jax.numpy as jnp

    det = PureScriptedDetector(clip, max_detections=8)
    frames = jnp.zeros((16, clip.height, clip.width, 3), jnp.uint8)
    det.set_block_start(10)
    host = det(frames)
    pure = det.forward_indexed(det.variables, frames, jnp.int32(10))
    for a, b in zip(host, pure):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mesh_yuv_wire_byte_identical_to_serial_yuv(clip, tmp_path):
    """The delta-I420 wire on the mesh path: each span ships planar
    4:2:0 deltas and the sharded step reconstructs RGB per device —
    shard files must be byte-identical to a serial --n-shards run in
    the SAME wire mode (both paths requantize chroma identically)."""
    out_serial = str(tmp_path / "serial")
    for i in range(N_DEV):
        scfg = ExtractConfig(n_shards=N_DEV, shard_i=i, block_frames=16,
                             max_detections=8, max_tracks=16,
                             wire_format="yuv420-delta")
        run_extract(clip.path, scfg, out_serial,
                    detector=PureScriptedDetector(clip, max_detections=8),
                    embedders=StubEmbedderBank())

    out_mesh = str(tmp_path / "mesh")
    cfg = ExtractConfig(block_frames=16, max_detections=8,
                        max_tracks=16, wire_format="yuv420-delta")
    mesh = frame_mesh(jax.devices()[:N_DEV])
    counters = run_extract_mesh(
        clip.path, cfg, out_mesh, mesh=mesh,
        detector=PureScriptedDetector(clip, max_detections=8),
        embedders=StubEmbedderBank())
    assert len(counters) == N_DEV

    for sub in ("trajectories", "features", "scene_changes", "images"):
        a = _tree_bytes(f"{out_serial}/125261-data/{sub}")
        b = _tree_bytes(f"{out_mesh}/125261-data/{sub}")
        assert set(a) == set(b), (sub, set(a) ^ set(b))
        for rel in a:
            assert a[rel] == b[rel], f"{sub}/{rel} differs"


def test_mesh_rgb_delta_wire_byte_identical_to_serial_rgb(clip, both_runs):
    """The rgb-delta wire on the mesh path is byte-identical to the
    SERIAL PLAIN-RGB run — the strongest wire claim: exact reconstruction
    composes with span decomposition."""
    import tempfile

    out_serial_rgb, _, _ = both_runs
    out_mesh = tempfile.mkdtemp(prefix="meshdelta_")
    cfg = ExtractConfig(block_frames=16, max_detections=8,
                        max_tracks=16, wire_format="rgb-delta")
    mesh = frame_mesh(jax.devices()[:N_DEV])
    counters = run_extract_mesh(
        clip.path, cfg, out_mesh, mesh=mesh,
        detector=PureScriptedDetector(clip, max_detections=8),
        embedders=StubEmbedderBank())
    assert len(counters) == N_DEV

    for sub in ("trajectories", "features", "scene_changes", "images"):
        a = _tree_bytes(f"{out_serial_rgb}/125261-data/{sub}")
        b = _tree_bytes(f"{out_mesh}/125261-data/{sub}")
        assert set(a) == set(b), (sub, set(a) ^ set(b))
        for rel in a:
            assert a[rel] == b[rel], f"{sub}/{rel} differs"
