"""End-to-end extract on a synthetic clip + full pipeline + sharding oracle."""
import json
import os

import numpy as np
import pytest

from facerec_tpu.config import (ClassifyConfig, ClusterConfig, ExtractConfig,
                                MergeConfig)
from facerec_tpu.contract import records
from facerec_tpu.pipeline.extract import EmbedderBank, run_extract
from facerec_tpu.pipeline.merge import run_merge
from facerec_tpu.video.synth import ScriptedDetector, make_clip


class StubEmbedderBank(EmbedderBank):
    """Fast deterministic embedder: pooled pixels → fixed projection."""

    def __init__(self, names=("m1", "m2"), dim=16, seed=0):
        rng = np.random.default_rng(seed)
        self.proj = {n: rng.normal(size=(75, dim)).astype(np.float32)
                     for n in names}

    def __call__(self, crops):
        x = np.asarray(crops, np.float32)
        n = x.shape[0]
        pooled = x.reshape(n, 5, 32, 5, 32, 3).mean(axis=(2, 4))
        flat = pooled.reshape(n, -1) / 255.0
        out = {}
        for name, p in self.proj.items():
            e = flat @ p
            e /= np.maximum(np.linalg.norm(e, axis=1, keepdims=True), 1e-9)
            out[name] = e
        return out


class DeferredStubBank(EmbedderBank):
    """Deferred-fetch-capable stub: same pooled-pixel projection as
    StubEmbedderBank but dispatched on device via dispatch_packed, so
    the group-fetch pipeline (extract.fetch_every_blocks) is exercised
    without the full FaceNet compile."""

    supports_deferred = True

    def __init__(self, names=("m1", "m2"), dim=16, seed=0):
        import jax
        import jax.numpy as jnp

        from facerec_tpu.runtime.transfer import pack_tree

        rng = np.random.default_rng(seed)
        self.names_ = list(names)
        self.dims = [dim] * len(names)
        self.total_dim = dim * len(names)
        proj = [jnp.asarray(rng.normal(size=(75, dim)), jnp.float32)
                for _ in names]

        def embed(crops):
            x = crops.astype(jnp.float32)
            pooled = x.reshape(-1, 5, 32, 5, 32, 3).mean(axis=(2, 4))
            flat = pooled.reshape(x.shape[0], -1) / 255.0
            outs = []
            for p in proj:
                e = flat @ p
                e = e / jnp.maximum(
                    jnp.linalg.norm(e, axis=1, keepdims=True), 1e-9)
                outs.append(e)
            return pack_tree(jnp.concatenate(outs, -1))

        self._packed = jax.jit(embed)

    def dispatch_packed(self, crops):
        return self._packed(crops)

    def unpack(self, buf, n):
        flat = np.asarray(buf).view(np.float32).reshape(-1, self.total_dim)
        parts = np.split(flat[:n], np.cumsum(self.dims)[:-1], axis=-1)
        return dict(zip(self.names_, parts))

    def __call__(self, crops):
        return self.unpack(np.asarray(self.dispatch_packed(crops)),
                           int(crops.shape[0]))


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("clips") / "125261-TestFilm-1955.mp4")
    return make_clip(path, n_frames=60, cuts=(30,), seed=3)


def extract_all(clip, out, n_shards=1, block_frames=16, save_images=True):
    counters = []
    for i in range(n_shards):
        cfg = ExtractConfig(
            n_shards=n_shards, shard_i=i, block_frames=block_frames,
            max_detections=8, max_tracks=16, save_images=save_images)
        c = run_extract(
            clip.path, cfg, out,
            detector=ScriptedDetector(clip, max_detections=8),
            embedders=StubEmbedderBank())
        counters.append(c)
    return counters


def test_extract_single_shard(clip, tmp_path):
    out = str(tmp_path / "out")
    (c,) = extract_all(clip, out)
    d = f"{out}/125261-data"

    assert c.frames_processed == 60
    assert c.overflow == 0
    assert c.saved_trajectories >= 2  # ≥2 faces, respawned at the cut
    assert c.saved_boxes > 0

    trajs = records.read_trajectories(
        f"{d}/trajectories/trajectories_125261_0-60.jsonl")
    assert len(trajs) == c.saved_trajectories
    # trajectories cover the whole clip without crossing the cut
    for t in trajs:
        assert t["object_type"] == "face"
        assert t["w"] == clip.width and t["h"] == clip.height
        assert not (t["start"] < 30 <= t["start"] + t["len"] - 1) or \
            30 not in json.load(open(
                f"{d}/scene_changes/scene_changes_125261_0-60.json")
            )["frame_indices"]

    feats = list(records.read_jsonl(
        f"{d}/features/features_125261_0-60.jsonl"))
    assert feats
    for f in feats:
        assert f["frame"] % 5 == 0
        assert set(f["embeddings"]) == {"m1", "m2"}
        assert len(f["embeddings"]["m1"]) == 16
        assert set(f["keypoints"]) == {"left_eye", "right_eye", "nose",
                                       "mouth_left", "mouth_right"}
        # tag matches box
        assert f["tag"] == "125261:{}:{}_{}_{}_{}".format(
            f["frame"], *f["box"])
    # features are in frame order
    frames = [f["frame"] for f in feats]
    assert frames == sorted(frames)

    # images exist and parse
    images = os.listdir(f"{d}/images")
    assert len(images) == len(feats)

    # scene change at the cut was found
    sc = json.load(open(
        f"{d}/scene_changes/scene_changes_125261_0-60.json"))
    assert 30 in sc["frame_indices"]


def test_extract_boxes_track_truth(clip, tmp_path):
    out = str(tmp_path / "out")
    extract_all(clip, out)
    d = f"{out}/125261-data"
    trajs = records.read_trajectories(
        f"{d}/trajectories/trajectories_125261_0-60.jsonl")
    # every trajectory box should be close to a ground-truth box
    for t in trajs:
        for i, box in enumerate(t["bbs"]):
            frame = t["start"] + i
            gt = [g[0] for g in clip.truth[frame]]
            dists = [np.abs(np.array(box) - g).max() for g in gt]
            assert min(dists) < 8, (frame, box, gt)


def test_shard_vs_unsharded(clip, tmp_path):
    """The reference's own design oracle: n_shards=k + merge ==
    n_shards=1 + merge (SURVEY.md §4)."""
    out1 = str(tmp_path / "one")
    out2 = str(tmp_path / "two")
    extract_all(clip, out1, n_shards=1)
    extract_all(clip, out2, n_shards=2)

    cfg = MergeConfig(min_face_size=10)
    run_merge(f"{out1}/125261-data", 125261, cfg)
    run_merge(f"{out2}/125261-data", 125261, cfg)

    t1 = records.read_trajectories(f"{out1}/125261-data/trajectories.jsonl")
    t2 = records.read_trajectories(f"{out2}/125261-data/trajectories.jsonl")
    assert len(t1) == len(t2)
    for a, b in zip(t1, t2):
        assert a["start"] == b["start"]
        assert a["len"] == b["len"]
        np.testing.assert_allclose(a["bbs"], b["bbs"], atol=2)

    s1 = json.load(open(f"{out1}/125261-data/scene_changes.json"))
    s2 = json.load(open(f"{out2}/125261-data/scene_changes.json"))
    assert s1 == s2


def test_full_pipeline(clip, tmp_path):
    """extract → merge → cluster → classify produces all 5 contract files."""
    import zipfile

    from facerec_tpu.pipeline.classify import (build_training_set,
                                               read_actor_embeddings,
                                               run_classify)
    from facerec_tpu.pipeline.cluster import run_cluster

    out = str(tmp_path / "out")
    extract_all(clip, out)
    d = f"{out}/125261-data"
    run_merge(d, 125261, MergeConfig(min_face_size=10))
    run_cluster(d, ClusterConfig(size=2, min_size=1, max_size=4,
                                 emb_name="m1"))

    # actor zip: 3 synthetic actors near the observed face embeddings
    feats = list(records.read_jsonl(f"{d}/features.jsonl"))
    rng = np.random.default_rng(0)
    zpath = tmp_path / "actor-images.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        for a in range(3):
            base = np.array(feats[min(a, len(feats) - 1)]
                            ["embeddings"]["m1"])
            for i in range(3):
                vec = (base + rng.normal(size=16) * 0.01).tolist()
                z.writestr(f"a{a}_{i}.json", json.dumps({
                    "box": [0, 0, 1, 1], "embeddings": {"m1": vec},
                    "actorID": str(500 + a), "actorname": f"A{a}"}))

    emb, _ = read_actor_embeddings(str(zpath), "m1")
    x, y = build_training_set(emb, min_samples=3)
    run_classify(d, x, y, ClassifyConfig(k=3, emb_name="m1"))

    for name in ("trajectories.jsonl", "features.jsonl",
                 "scene_changes.json", "clusters.json", "predictions.json"):
        assert os.path.exists(os.path.join(d, name)), name
    preds = json.load(open(os.path.join(d, "predictions.json")))
    assert preds["movie_id"] == 125261

    # every stage reported its counters into ONE run_report.json
    # (SURVEY.md §5.5)
    report = json.load(open(os.path.join(d, "run_report.json")))
    assert {"merge", "cluster", "classify"} <= set(report)
    assert any(k.startswith("extract_") for k in report)
    assert report["merge"]["counters"]["saved"] >= 1
    assert report["cluster"]["counters"]["n_clusters"] >= 1
    assert report["classify"]["counters"]["n_predictions"] >= 0


def test_block_size_invariance(clip, tmp_path):
    """Padded-tail blocks (block larger than the remaining frames) must
    produce byte-identical contract files to small exact blocks."""
    import filecmp

    out_a = str(tmp_path / "b16")
    out_b = str(tmp_path / "b64")
    extract_all(clip, out_a, block_frames=16, save_images=False)
    # 60-frame film, one 64-frame padded block (and padded shard tails)
    extract_all(clip, out_b, block_frames=64, save_images=False)
    da, db = f"{out_a}/125261-data", f"{out_b}/125261-data"
    for sub in ("trajectories", "features", "scene_changes"):
        fa = sorted(os.listdir(f"{da}/{sub}"))
        fb = sorted(os.listdir(f"{db}/{sub}"))
        assert fa == fb
        for f in fa:
            assert filecmp.cmp(f"{da}/{sub}/{f}", f"{db}/{sub}/{f}",
                               shallow=False), (sub, f)


def _compare_shard_files(da, db):
    import filecmp

    for sub in ("trajectories", "features", "scene_changes"):
        fa = sorted(os.listdir(f"{da}/{sub}"))
        fb = sorted(os.listdir(f"{db}/{sub}"))
        assert fa == fb
        for f in fa:
            assert filecmp.cmp(f"{da}/{sub}/{f}", f"{db}/{sub}/{f}",
                               shallow=False), (sub, f)


def test_fetch_grouping_invariance(clip, tmp_path):
    """Batched device→host group fetches (fetch_every_blocks) must not
    change a single output byte — flush semantics are per-block at any
    group size, including a group larger than the whole film."""
    outs = {}
    for g in (1, 3, 64):
        out = str(tmp_path / f"g{g}")
        cfg = ExtractConfig(block_frames=16, max_detections=8,
                            max_tracks=16, save_images=False,
                            fetch_every_blocks=g)
        run_extract(clip.path, cfg, out,
                    detector=ScriptedDetector(clip, max_detections=8),
                    embedders=DeferredStubBank())
        outs[g] = f"{out}/125261-data"
    _compare_shard_files(outs[1], outs[3])
    _compare_shard_files(outs[1], outs[64])


def test_fetch_grouping_crash_resume(clip, tmp_path):
    """Checkpoints drain the deferred embed pipeline: a crashed grouped
    run resumes to byte-identical output."""
    from tests.test_checkpoint import CrashingDetector

    def cfg(ck):
        return ExtractConfig(block_frames=8, max_detections=8,
                             max_tracks=16, save_images=False,
                             fetch_every_blocks=4,
                             checkpoint_every_blocks=ck)

    clean = str(tmp_path / "clean")
    run_extract(clip.path, cfg(0), clean,
                detector=ScriptedDetector(clip, max_detections=8),
                embedders=DeferredStubBank())

    crashed = str(tmp_path / "crashed")
    with pytest.raises(RuntimeError, match="injected crash"):
        run_extract(clip.path, cfg(2), crashed,
                    detector=CrashingDetector(clip, crash_at_frame=40,
                                              max_detections=8),
                    embedders=DeferredStubBank())
    assert any(f.endswith(".ckpt")
               for f in os.listdir(f"{crashed}/125261-data"))
    run_extract(clip.path, cfg(2), crashed,
                detector=ScriptedDetector(clip, max_detections=8),
                embedders=DeferredStubBank())
    _compare_shard_files(f"{clean}/125261-data", f"{crashed}/125261-data")


@pytest.mark.slow
def test_full_hd_film_e2e(tmp_path):
    """≥1080p display resolution through the full extract path — the
    resolution class where the scene kernel's plane exceeds the fused
    Pallas budget and takes the row-tiled path on TPU (bit-identical
    bincount fallback here on CPU; scripts/tpu_kernel_check.py runs the
    same block on hardware).  VERDICT r2 next-step #7."""
    from facerec_tpu.ops.pallas.equalize import _FUSED_PLANE_BYTES
    from facerec_tpu.video.synth import PureScriptedDetector

    w, h = 1920, 1080
    # this resolution MUST exercise row tiling on TPU
    assert h * w * 4 > _FUSED_PLANE_BYTES

    path = str(tmp_path / "88-FullHD.mp4")
    clip = make_clip(path, n_frames=16, width=w, height=h, cuts=(8,),
                     seed=17)
    out = str(tmp_path / "out")
    cfg = ExtractConfig(n_shards=1, shard_i=0, block_frames=8,
                        max_detections=8, max_tracks=16,
                        save_images=True)
    c = run_extract(clip.path, cfg, out,
                    detector=PureScriptedDetector(clip, max_detections=8),
                    embedders=DeferredStubBank())
    assert c.frames_processed == 16
    d = f"{out}/88-data"
    sc = json.load(open(f"{d}/scene_changes/scene_changes_88_0-16.json"))
    assert sc["frame_indices"] == [8]
    feats = list(records.read_jsonl(f"{d}/features/features_88_0-16.jsonl"))
    assert feats
    for f in feats:
        assert f["w"] == w and f["h"] == h
        assert 0 <= f["box"][0] < f["box"][2] <= w
    assert len(os.listdir(f"{d}/images")) == len(feats)


@pytest.mark.slow
def test_odd_geometry_film(tmp_path):
    """Non-standard frame geometry end to end: odd crop inset, row
    padding in the scene kernel packing, AR-fitted detector sizing."""
    path = str(tmp_path / "99-Odd_Film.mp4")
    clip = make_clip(path, n_frames=40, width=210, height=150,
                     cuts=(20,), seed=9)
    out = str(tmp_path / "out")
    cfg = ExtractConfig(n_shards=1, shard_i=0, block_frames=16,
                        max_detections=8, save_images=False)
    run_extract(clip.path, cfg, out,
                detector=ScriptedDetector(clip, max_detections=8),
                embedders=StubEmbedderBank())
    import json as _json
    sc = _json.load(open(
        f"{out}/99-data/scene_changes/scene_changes_99_0-40.json"))
    assert sc["frame_indices"] == [20]
    trajs = list(open(f"{out}/99-data/trajectories/"
                      "trajectories_99_0-40.jsonl"))
    assert trajs


def test_one_flush_dispatch_per_fetch_group(clip, tmp_path):
    """The production loop must batch every fetch group's face flushes
    into ONE crop+embed dispatch — per-block device calls each pay a
    full link round trip on high-latency hosts (docs/DESIGN.md
    "Group-batched fetches").  Regression-pins the interaction count:
    dispatches ≤ ceil(blocks/group) + 1 (the +1 is the final drain)."""

    class CountingBank(DeferredStubBank):
        def __init__(self):
            super().__init__()
            self.crop_embed_calls = 0
            self.packed_calls = 0

        def dispatch_crop_embed(self, stack, frame_idx, crop_boxes):
            self.crop_embed_calls += 1
            return super().dispatch_crop_embed(stack, frame_idx,
                                               crop_boxes)

        def dispatch_packed(self, crops):
            self.packed_calls += 1
            return super().dispatch_packed(crops)

    bank = CountingBank()
    group = 4
    cfg = ExtractConfig(block_frames=8, max_detections=8, max_tracks=16,
                        save_images=False, fetch_every_blocks=group)
    run_extract(clip.path, cfg, str(tmp_path / "out"),
                detector=ScriptedDetector(clip, max_detections=8),
                embedders=bank)
    n_blocks = -(-65 // 8)   # 60 frames + 5 overlap, blocks of 8
    max_groups = -(-n_blocks // group) + 1
    assert 0 < bank.crop_embed_calls <= max_groups, (
        bank.crop_embed_calls, max_groups)
    # every embed came through the batched crop+embed entry point
    assert bank.packed_calls == bank.crop_embed_calls


@pytest.mark.slow
def test_grouped_fetch_byte_identity(clip, tmp_path):
    """The loop batches every fetch group's packed payloads into ONE
    joined device→host transfer; output files must match the
    fetch-every-block path byte for byte at any group size, including
    the short tail group."""
    from facerec_tpu.video.synth import PureScriptedDetector

    outs = {}
    for g in (1, 3, 64):
        out = str(tmp_path / f"g{g}")
        cfg = ExtractConfig(block_frames=16, max_detections=8,
                            max_tracks=16, save_images=False,
                            fetch_every_blocks=g)
        run_extract(clip.path, cfg, out,
                    detector=PureScriptedDetector(clip, max_detections=8),
                    embedders=DeferredStubBank())
        outs[g] = f"{out}/125261-data"
    _compare_shard_files(outs[1], outs[3])
    _compare_shard_files(outs[1], outs[64])


@pytest.mark.slow
def test_grouped_fetch_crash_resume(clip, tmp_path, monkeypatch):
    """Group-batched fetch + checkpoints: a run crashed mid-film
    resumes to byte-identical output (the checkpointed device state is
    the last CONSUMED block's, a group behind dispatch)."""
    from facerec_tpu.pipeline import extract as ex
    from facerec_tpu.video.synth import PureScriptedDetector

    def cfg(ck):
        return ExtractConfig(block_frames=8, max_detections=8,
                             max_tracks=16, save_images=False,
                             fetch_every_blocks=2,
                             checkpoint_every_blocks=ck)

    clean = str(tmp_path / "clean")
    run_extract(clip.path, cfg(0), clean,
                detector=PureScriptedDetector(clip, max_detections=8),
                embedders=DeferredStubBank())

    real_open = ex.open_block_reader

    def flaky_open(*a, **kw):
        r = real_open(*a, **kw)
        real_blocks = r.blocks

        def blocks(beg, end, block):
            for k, item in enumerate(real_blocks(beg, end, block)):
                if k == 5:
                    raise RuntimeError("injected crash")
                yield item

        r.blocks = blocks
        return r

    crashed = str(tmp_path / "crashed")
    monkeypatch.setattr(ex, "open_block_reader", flaky_open)
    with pytest.raises(RuntimeError, match="injected crash"):
        run_extract(clip.path, cfg(2), crashed,
                    detector=PureScriptedDetector(clip, max_detections=8),
                    embedders=DeferredStubBank())
    monkeypatch.setattr(ex, "open_block_reader", real_open)
    assert any(f.endswith(".ckpt")
               for f in os.listdir(f"{crashed}/125261-data"))
    run_extract(clip.path, cfg(2), crashed,
                detector=PureScriptedDetector(clip, max_detections=8),
                embedders=DeferredStubBank())
    _compare_shard_files(f"{clean}/125261-data", f"{crashed}/125261-data")


@pytest.mark.slow
def test_wire_format_yuv420_delta(clip, tmp_path):
    """The delta-I420 wire format (cfg.wire_format, ops/yuv.py) runs
    the same pipeline with half the upload bytes: scene cuts and
    trajectories must match the RGB wire exactly (detections are
    scripted; the synthetic cuts are far above the flag threshold),
    feature records must cover the same faces, and the format must be
    fetch-group invariant (byte-identical files across group sizes
    within the mode)."""
    import filecmp
    import json

    from facerec_tpu.video.synth import PureScriptedDetector

    outs = {}
    for name, wire, group in (("rgb", "rgb", 3),
                              ("yuv", "yuv420-delta", 3),
                              ("yuv1", "yuv420-delta", 1)):
        out = str(tmp_path / name)
        cfg = ExtractConfig(block_frames=16, max_detections=8,
                            max_tracks=16, save_images=(name != "yuv1"),
                            fetch_every_blocks=group, wire_format=wire)
        run_extract(clip.path, cfg, out,
                    detector=PureScriptedDetector(clip, max_detections=8),
                    embedders=DeferredStubBank())
        outs[name] = f"{out}/125261-data"

    # fetch-group invariance within the yuv mode: all bytes equal
    _compare_shard_files(outs["yuv"], outs["yuv1"])

    # vs the RGB wire: identical cuts + trajectories (pixel-exact
    # inputs to neither), features for the same (frame, box) faces
    for sub in ("trajectories", "scene_changes"):
        fa = sorted(os.listdir(f"{outs['rgb']}/{sub}"))
        assert fa == sorted(os.listdir(f"{outs['yuv']}/{sub}"))
        for f in fa:
            assert filecmp.cmp(f"{outs['rgb']}/{sub}/{f}",
                               f"{outs['yuv']}/{sub}/{f}",
                               shallow=False), (sub, f)
    (feat_a,) = os.listdir(f"{outs['rgb']}/features")
    with open(f"{outs['rgb']}/features/{feat_a}") as fh:
        recs_a = [json.loads(l) for l in fh]
    with open(f"{outs['yuv']}/features/{feat_a}") as fh:
        recs_b = [json.loads(l) for l in fh]
    assert [(r["frame"], r["box"]) for r in recs_a] == \
        [(r["frame"], r["box"]) for r in recs_b]
    # JPEG face images: same files saved (bytes may differ by the
    # I420 chroma round trip of the host pixel window)
    assert sorted(os.listdir(f"{outs['rgb']}/images")) == \
        sorted(os.listdir(f"{outs['yuv']}/images"))


def test_plan_flush_requeue_keeps_frame_order(tmp_path):
    """An UNDECIDED face re-queued at a block boundary must re-enter
    pending AHEAD of later blocks' faces, so features.jsonl records
    stay monotone in frame like the reference's, which writes per
    processed frame in order (/root/reference/facerec/extract.py:
    186-195).  The undecided branch is defensive (track validity is
    decidable within min_hits frames of any detection on the normal
    path), so this pins plan_flush's re-queue ordering directly.
    VERDICT r3 weak #5."""
    from facerec_tpu.contract.naming import MovieDirs
    from facerec_tpu.pipeline import faces as faces_mod
    from facerec_tpu.pipeline.extract import ShardConsumer

    dirs = MovieDirs.create(str(tmp_path), 125261)
    cfg = ExtractConfig(block_frames=8, save_images=False, save_every=1)
    cons = ShardConsumer(dirs, 125261, cfg, 0, 16, 192, 144,
                         StubEmbedderBank())
    validity = {0: True, 1: None}
    cons.assembler.track_valid = lambda uid: validity.get(uid)
    cons.pixel_window[0] = np.zeros((16, 144, 192, 3), np.uint8)

    def face(frame, uid):
        return faces_mod.PendingFace(
            frame=frame, uid=uid,
            posterior_box=np.array([10.0, 10.0, 50.0, 60.0]),
            landmarks=np.zeros((5, 2), np.float32))

    # block-0 flush: face@4 (uid 1) is undecided and re-queues; faces
    # @6,7 (uid 0) sit in the later-queue at the same moment
    cons.pending = [face(4, 1), face(6, 0), face(7, 0)]
    cons.flush_faces(5)
    assert [p.frame for p in cons.pending] == [4, 6, 7]
    validity[1] = True        # decided during the next block
    cons.pending += [face(8, 0), face(9, 0)]
    cons.flush_faces(None)
    cons.finish()

    feats = list(records.read_jsonl(
        f"{dirs.features}/features_125261_0-16.jsonl"))
    assert [f["frame"] for f in feats] == [4, 6, 7, 8, 9]


@pytest.mark.slow
def test_feature_records_frame_ordered_e2e(tmp_path):
    """End-to-end invariant: features.jsonl is monotone in frame (with
    cuts, flickering detections and grouped fetches in play)."""
    from facerec_tpu.video.synth import PureScriptedDetector

    path = str(tmp_path / "125261-Order.mp4")
    clip = make_clip(path, n_frames=48, cuts=(20,), seed=11)
    det = PureScriptedDetector(clip, max_detections=8)
    # face 1 flickers around block boundaries
    v = det.variables["valid"]
    v[:4, 1] = False
    v[5:8, 1] = False

    out = str(tmp_path / "out")
    cfg = ExtractConfig(block_frames=8, max_detections=8, max_tracks=16,
                        save_images=False, save_every=1,
                        fetch_every_blocks=3)
    run_extract(clip.path, cfg, out, detector=det,
                embedders=DeferredStubBank())

    feats = list(records.read_jsonl(
        f"{out}/125261-data/features/features_125261_0-48.jsonl"))
    frames = [f["frame"] for f in feats]
    assert frames and frames == sorted(frames)


@pytest.mark.slow
def test_wire_format_rgb_delta_byte_identical(clip, tmp_path):
    """The rgb-delta wire must not change ONE output byte vs the plain
    rgb wire: the device undoes the uint8-wraparound deltas exactly
    (ops/yuv.delta_decode), so it is a parity-preserving transfer
    optimization, unlike yuv420-delta's chroma requantization."""
    from facerec_tpu.video.synth import PureScriptedDetector

    outs = {}
    for wire in ("rgb", "rgb-delta"):
        out = str(tmp_path / wire)
        cfg = ExtractConfig(block_frames=16, max_detections=8,
                            max_tracks=16, save_images=True,
                            fetch_every_blocks=3, wire_format=wire)
        run_extract(clip.path, cfg, out,
                    detector=PureScriptedDetector(clip, max_detections=8),
                    embedders=DeferredStubBank())
        outs[wire] = f"{out}/125261-data"

    import filecmp
    for sub in ("trajectories", "features", "scene_changes", "images"):
        fa = sorted(os.listdir(f"{outs['rgb']}/{sub}"))
        assert fa == sorted(os.listdir(f"{outs['rgb-delta']}/{sub}")), sub
        for f in fa:
            assert filecmp.cmp(f"{outs['rgb']}/{sub}/{f}",
                               f"{outs['rgb-delta']}/{sub}/{f}",
                               shallow=False), (sub, f)
