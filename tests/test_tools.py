"""Tools: subtitles, twins, boxdata, SVM propagation, orchestrator,
actor DB builder (offline with injected fetchers)."""
import io
import json
import os
import zipfile

import numpy as np
import pytest

from facerec_tpu.contract import records


@pytest.fixture
def movie_data(tmp_path):
    d = tmp_path / "123456-data"
    d.mkdir()
    trajs = [
        records.trajectory_record(10, [[10, 10, 50, 50]] * 3,
                                  [True] * 3, 320, 240),
        records.trajectory_record(11, [[100, 100, 140, 140]] * 3,
                                  [True] * 3, 320, 240),
    ]
    with open(d / "trajectories.jsonl", "w") as f:
        for i, t in enumerate(trajs):
            t["index"] = i
            t["movie_id"] = 123456
            records.write_trajectory(f, t)
    records.write_clusters(str(d / "clusters.json"), [0, 1], 123456)
    records.write_predictions(str(d / "predictions.json"), 123456, {
        0: {"momaf:elonet_henkilo_77": 0.9},
        1: {"momaf:elonet_henkilo_77": 0.6,
            "momaf:elonet_henkilo_88": 0.3},
    })
    return d


@pytest.fixture
def actors_csv(tmp_path):
    p = tmp_path / "actors.csv"
    p.write_text("id,name\n77,Tauno Palo\n88,Ansa Ikonen\n")
    return str(p)


METADATA = {
    "format": {"filename": "/films/123456-film.mp4"},
    "streams": [{"codec_type": "video", "width": 710, "height": 574,
                 "sample_aspect_ratio": "16:15",
                 "avg_frame_rate": "25/1"}],
}


def test_subtitles(movie_data, actors_csv, tmp_path):
    from facerec_tpu.tools.subtitles import (parse_video_metadata,
                                             write_subtitles)

    dw, dh, sar, fps = parse_video_metadata(METADATA)
    assert (dw, dh, fps) == (757, 574, 25.0)
    assert abs(sar - 16 / 15) < 1e-9

    out = tmp_path / "film.ass"
    n = write_subtitles(str(movie_data), str(out), actors_csv, METADATA)
    text = out.read_text()
    assert n == 12  # 2 trajectories × 3 frames × 2 events
    assert "Tauno Palo/0" in text
    assert "PlayResX: 757" in text
    assert text.count("Dialogue:") == 12


def test_twins(movie_data, actors_csv):
    from facerec_tpu.tools.subtitles import load_actor_names
    from facerec_tpu.tools.twins import find_twins

    names = load_actor_names(actors_csv)
    rows = find_twins(str(movie_data), names)
    # both clusters predict actor 77; trajectories overlap frames 11-12
    assert (11, "Tauno Palo", 2) in rows
    assert (12, "Tauno Palo", 2) in rows
    assert (10, "Tauno Palo", 1) not in rows


def test_boxdata(movie_data, capsys):
    import sys

    from facerec_tpu.tools.boxdata import dump_boxdata

    n = dump_boxdata(str(movie_data), "123456", sys.stdout)
    out = capsys.readouterr().out.strip().splitlines()
    assert n == 6 and len(out) == 6
    assert out[0] == ("**boxdata** 123456 10 11 retinaface facenet "
                      "10 10 50 50 1 face 123456_0")


def test_svm_propagation(rng):
    from facerec_tpu.ops.svm import decision_function, train_linear_svm

    centers = rng.normal(size=(3, 8)) * 4
    x = np.concatenate([centers[i] + rng.normal(size=(30, 8)) * 0.3
                        for i in range(3)]).astype(np.float32)
    y = np.repeat([5, 9, 2], 30)
    w, b, classes = train_linear_svm(x, y)
    assert classes.tolist() == [2, 5, 9]
    pred = classes[decision_function(x, w, b).argmax(axis=1)]
    assert (pred == y).mean() > 0.95


def test_orchestrator_aborts_on_failure(tmp_path):
    from facerec_tpu.pipeline.orchestrate import Stage, run_pipeline

    ran = []

    def ok():
        ran.append("ok")

    def bad():
        raise RuntimeError("boom")

    assert run_pipeline([Stage("a", ok), Stage("b", bad),
                         Stage("c", ok)]) is False
    assert ran == ["ok"]
    assert run_pipeline([Stage("a", ok), Stage("b", bad, skip=True),
                         Stage("c", ok)]) is True

    # with a data_dir, stage timings land in run_report.json
    import json

    d = tmp_path / "9-data"
    d.mkdir()
    assert run_pipeline([Stage("a", ok), Stage("b", bad)],
                        data_dir=str(d)) is False
    report = json.load(open(d / "run_report.json"))
    assert report["pipeline"]["counters"]["failed_stage"] == "b"
    assert report["pipeline"]["counters"]["a_seconds"] >= 0


def test_orchestrator_accepts_every_extract_wire_format(capsys):
    """The orchestrator passes --wire-format through to extract, so its
    argparse choices must cover everything extract accepts (rgb-delta —
    the byte-exact parity wire — was missing from the pass-through)."""
    import pytest as _pytest

    from facerec_tpu.pipeline.orchestrate import main

    for wire in ("rgb", "rgb-delta", "yuv420-delta"):
        with _pytest.raises(SystemExit) as exc:
            main(["--wire-format", wire])   # no --filmfile on purpose
        assert exc.value.code == 2
        err = capsys.readouterr().err
        assert "invalid choice" not in err, (wire, err)
        assert "--filmfile" in err


def test_prepare_actors_offline(tmp_path, rng):
    """Actor DB builder with injected SPARQL/fetch and a stub embedder:
    zip caching, resume, same-film preference."""
    from facerec_tpu.pipeline import actors as A

    def sparql(query):
        if "momaf:Movie" in query and "momaf:Image" not in query:
            raise AssertionError("film query not used here")
        rows = []
        for i in range(4):
            film = "111" if i < 2 else "222"
            rows.append({
                "actorURI": {"value": "u"}, "actorID": {"value": "77"},
                "actorname": {"value": "Tauno"},
                "imageURI": {"value": f"i{i}"},
                "image_url": {"value": f"http://x/{i}.jpg"},
                "filename": {"value": f"img{i}.jpg"},
                "filmURI": {"value": "f"}, "filmID": {"value": film},
                "filmname": {"value": "Film"},
            })
        return {"results": {"bindings": rows}}

    fetched = []

    def fetch(url):
        fetched.append(url)
        return b"JPEGDATA" + url.encode()

    class StubEmbed:
        def __call__(self, data):
            return {"box": [1, 2, 3, 4],
                    "embeddings": {"m": [0.1, 0.2]}}

    zipf = str(tmp_path / "actors" / "actor-images.zip")
    actor = {"filmID": "111", "actorID": "77", "actorname": "Tauno"}
    faces = A.prepare_one_actor(actor, 3, zipf, StubEmbed(),
                                sparql=sparql, fetch=fetch)
    assert len(faces) == 3
    # same-film images (0,1) fetched before others (2)
    assert fetched == ["http://x/0.jpg", "http://x/1.jpg",
                       "http://x/2.jpg"]

    with zipfile.ZipFile(zipf) as z:
        names = z.namelist()
        assert "img0.jpg" in names and "img0.jpg.json" in names
        side = json.loads(z.read("img0.jpg.json"))
        assert side["actorID"] == "77"
        assert side["embeddings"]["m"] == [0.1, 0.2]

    # resume: nothing new fetched, faces come from cache
    fetched.clear()
    faces2 = A.prepare_one_actor(actor, 3, zipf, StubEmbed(),
                                 sparql=sparql, fetch=fetch)
    assert len(faces2) == 3
    assert fetched == []


def test_prepare_actors_no_unique_face(tmp_path):
    from facerec_tpu.pipeline import actors as A

    def sparql(query):
        return {"results": {"bindings": [{
            "actorURI": {"value": "u"}, "actorID": {"value": "9"},
            "actorname": {"value": "X"}, "imageURI": {"value": "i"},
            "image_url": {"value": "http://x/a.jpg"},
            "filename": {"value": "a.jpg"},
            "filmURI": {"value": "f"}, "filmID": {"value": "1"},
            "filmname": {"value": "F"}}]}}

    class NoFace:
        def __call__(self, data):
            return None

    zipf = str(tmp_path / "actor-images.zip")
    faces = A.prepare_one_actor(
        {"filmID": "1", "actorID": "9", "actorname": "X"}, 5, zipf,
        NoFace(), sparql=sparql, fetch=lambda u: b"D")
    assert faces == []
    with zipfile.ZipFile(zipf) as z:
        side = json.loads(z.read("a.jpg.json"))
        assert side["note"] == "no unique face"
        assert "box" not in side
