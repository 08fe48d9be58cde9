"""Actor reference database builder.

Behavioural rebuild of /root/reference/facerec/prepare-actors.py:
queries the MoMaF knowledge graph for a film's actors and their image
URLs (SPARQL over HTTP), downloads each image, keeps those with exactly
one detected face, embeds with all four FaceNet checkpoints and caches
image + JSON sidecar incrementally into ``actor-images.zip`` (the file
the classify stage consumes).  Same-film images are preferred, then
others; the zip manifest makes the process crash-resumable.

Network access is injected (``fetch_url`` / ``sparql_query``) so the
pipeline is testable offline.
"""
from __future__ import annotations

import argparse
import json
import os
import re
import zipfile
from typing import Callable, Dict, List, Optional

import numpy as np

SPARQL_URL = "http://momaf-data.utu.fi:3030/momaf-raw/sparql"

FILM_QUERY = """
PREFIX skos: <http://www.w3.org/2004/02/skos/core#>
PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
PREFIX momaf: <http://momaf-data.utu.fi/>

SELECT ?filmURI ?filmID ?filmname ?actorURI ?actorID (sample(?a) as ?actorname)
WHERE {
  ?filmURI a momaf:Movie ;
          momaf:elonet_movie_ID <FILM>, ?filmID ;
          skos:prefLabel ?filmname ;
          momaf:hasMember [
            a momaf:Actor ;
            momaf:hasAgent ?actorURI
          ] .
  ?actorURI a momaf:Person ;
          momaf:elonet_person_ID ?actorID ;
          skos:prefLabel ?a .
} GROUP BY ?filmURI ?filmID ?filmname ?actorURI ?actorID
"""

ACTOR_QUERY = """
PREFIX skos: <http://www.w3.org/2004/02/skos/core#>
PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
PREFIX momaf: <http://momaf-data.utu.fi/>

SELECT ?actorURI ?actorID (sample(?a) as ?actorname)
       ?imageURI ?image_url ?filename ?filmURI ?filmID ?filmname
WHERE {
  ?actorURI a momaf:Person ;
          momaf:elonet_person_ID <ACTOR>, ?actorID ;
          skos:prefLabel ?a .
  ?imageURI a momaf:Image ;
          momaf:hasMember [ momaf:hasAgent ?actorURI ] ;
          momaf:sourcefile ?image_url ;
          skos:prefLabel ?filename ;
          momaf:hasMember [ momaf:hasAgent ?filmURI ] .
  ?filmURI a momaf:Movie ;
          momaf:elonet_movie_ID <FILM> , ?filmID ;
          skos:prefLabel ?filmname .
} GROUP BY ?filmURI ?filmID ?filmname ?actorURI ?actorID ?imageURI ?image_url ?filename
"""


def default_sparql_query(query: str) -> dict:
    """POST a SPARQL query, return parsed JSON bindings."""
    import urllib.parse
    import urllib.request

    data = urllib.parse.urlencode({"query": query}).encode()
    req = urllib.request.Request(
        SPARQL_URL, data=data,
        headers={"Accept": "application/sparql-results+json"})
    with urllib.request.urlopen(req, timeout=60) as resp:
        return json.loads(resp.read())


def default_fetch_url(url: str) -> Optional[bytes]:
    import urllib.request

    try:
        with urllib.request.urlopen(url, timeout=60) as resp:
            return resp.read()
    except Exception as e:
        print(f"FAILED to retrieve {url} : {e}")
        return None


def _digits(value) -> str:
    if isinstance(value, int):
        return str(value)
    m = re.search(r"(\d+)", str(value))
    if not m:
        raise ValueError(f"No digits in <{value}>")
    return m.group(1)


def _bindings(results: dict, keys: List[str]) -> List[dict]:
    out = []
    for res in results["results"]["bindings"]:
        out.append({k: res[k]["value"] if k in res else None for k in keys})
    return out


def fetch_actor_list(film, sparql: Callable = default_sparql_query):
    q = FILM_QUERY.replace("<FILM>", f'"{_digits(film)}"')
    keys = [a + b for a in ("film", "actor") for b in ("URI", "ID", "name")]
    return _bindings(sparql(q), keys)


def fetch_actor_image_urls(actor, film,
                           sparql: Callable = default_sparql_query):
    film_term = "?film" if film is None else f'"{_digits(film)}"'
    q = (ACTOR_QUERY.replace("<ACTOR>", f'"{_digits(actor)}"')
         .replace("<FILM>", film_term))
    keys = ([a + b for a in ("film", "actor")
             for b in ("URI", "ID", "name")]
            + ["imageURI", "image_url", "filename"])
    return _bindings(sparql(q), keys)


class FaceEmbedderForImages:
    """Single-image detect+embed: exactly-one-face gate, tight box,
    4-checkpoint embeddings (prepare-actors.py:163-197)."""

    def __init__(self, detector=None, embedders=None,
                 detector_weights=None, facenet_weights=None):
        self._detector = detector
        self._embedders = embedders
        self._detector_weights = detector_weights
        self._facenet_weights = facenet_weights

    @property
    def detector(self):
        if self._detector is None:
            kwargs = dict(input_size=(512, 512), max_detections=8,
                          score_threshold=0.95, min_face_size=20)
            if self._detector_weights is not None:
                from facerec_tpu.models.load import load_detector_harness

                self._detector = load_detector_harness(
                    self._detector_weights, **kwargs)
            else:
                from facerec_tpu.models import DetectorHarness
                from facerec_tpu.models.load import warn_random_init

                warn_random_init("The face detector",
                                 "--detector-weights")
                self._detector = DetectorHarness.create(**kwargs)
        return self._detector

    @property
    def embedders(self):
        if self._embedders is None:
            from facerec_tpu.pipeline.extract import EmbedderBank

            if self._facenet_weights is not None:
                self._embedders = EmbedderBank.from_weights(
                    self._facenet_weights)
            else:
                from facerec_tpu.models.load import warn_random_init

                warn_random_init("The FaceNet embedder bank",
                                 "--facenet-weights")
                self._embedders = EmbedderBank.create_default()
        return self._embedders

    def __call__(self, image_bytes: bytes) -> Optional[dict]:
        import cv2
        import jax.numpy as jnp

        from facerec_tpu.config import FACE_IMAGE_SIZE
        from facerec_tpu.ops.boxes import round_clip_box
        from facerec_tpu.ops.crops import crop_resize_dispatch
        from facerec_tpu.pipeline.faces import embed_crop_box

        buf = np.frombuffer(image_bytes, np.uint8)
        img = cv2.imdecode(buf, cv2.IMREAD_COLOR)
        if img is None:
            return None
        img = np.ascontiguousarray(img[..., ::-1])  # BGR → RGB
        h, w = img.shape[:2]

        det = self.detector(jnp.asarray(img[None]))
        valid = np.asarray(det.valid[0])
        if valid.sum() != 1:
            return None
        box = np.asarray(det.boxes[0])[valid.argmax()]

        tight = round_clip_box(box, w, h)
        crop_box = embed_crop_box(tight, w, h)
        crops = crop_resize_dispatch(
            jnp.asarray(img[None]), jnp.zeros(1, jnp.int32),
            jnp.asarray(crop_box[None]), FACE_IMAGE_SIZE)
        embeddings = {name: vecs[0].tolist()
                      for name, vecs in self.embedders(crops).items()}
        return {"box": tight, "embeddings": embeddings}


def prepare_one_actor(actor: dict, n_images: int, zip_path: str,
                      embed: FaceEmbedderForImages,
                      sparql: Callable = default_sparql_query,
                      fetch: Callable = default_fetch_url) -> List[dict]:
    """Cache up to ``n_images`` embedded faces for one actor, resuming
    from what's already in the zip (prepare-actors.py:200-251)."""
    existing = []
    if os.path.isfile(zip_path):
        with zipfile.ZipFile(zip_path) as z:
            existing = z.namelist()
    os.makedirs(os.path.dirname(zip_path) or ".", exist_ok=True)

    fid, aid, aname = actor["filmID"], actor["actorID"], actor["actorname"]
    images = fetch_actor_image_urls(aid, None, sparql)
    faces: List[dict] = []

    with zipfile.ZipFile(zip_path, "a") as zf:
        # same-film images first, then others
        for same_film in (True, False):
            for img in images:
                if same_film != (img["filmID"] == fid):
                    continue
                iname = img["filename"]
                jname = iname + ".json"
                have_json = jname in existing
                have_image = iname in existing
                idata = None
                if not have_image:
                    idata = fetch(img["image_url"])
                    if idata is None:
                        continue
                    zf.writestr(iname, idata)
                    existing.append(iname)
                elif not have_json:
                    idata = zf.read(iname)

                if not have_json:
                    face = embed(idata)
                    if face is None:
                        face = {"note": "no unique face"}
                    else:
                        face["actorID"] = aid
                        face["actorname"] = aname
                    face["filmID"] = img["filmID"]
                    face["filmname"] = img["filmname"]
                    face["image_url"] = img["image_url"]
                    face["filename"] = iname
                    zf.writestr(jname, json.dumps(face))
                    existing.append(jname)
                else:
                    face = json.loads(zf.read(jname))
                if "box" in face:
                    faces.append(face)
                if len(faces) >= n_images:
                    return faces
            if len(faces) >= n_images:
                break
    return faces


def main(argv=None):
    from facerec_tpu.runtime import ensure_platform

    ensure_platform()
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
        description="Collect actor face embeddings for a film.")
    parser.add_argument("--film", type=str, required=True)
    parser.add_argument("--actors-dir", type=str, default=".")
    parser.add_argument("--n-faces", type=int, default=20)
    parser.add_argument("--path", type=str, default=".")
    parser.add_argument("--facenet-weights", type=str, default=None,
                        help="directory with the four FaceNet "
                             "checkpoints (see extract --help)")
    parser.add_argument("--detector-weights", type=str, default=None,
                        help="orbax checkpoint dir of detector weights")
    args = parser.parse_args(argv)

    actors = fetch_actor_list(args.film)
    if not actors:
        print(f"No actors found for film <{args.film}>")
        return 1

    zipf = os.path.join(args.actors_dir, "actor-images.zip")
    embed = FaceEmbedderForImages(
        detector_weights=args.detector_weights,
        facenet_weights=args.facenet_weights)
    faces = []
    for a in actors:
        faces.extend(prepare_one_actor(a, args.n_faces, zipf, embed))

    if not faces:
        print(f"No actor faces found for film <{args.film}>")
        return 1

    out = os.path.join(args.path,
                       f"actor-faces-{actors[0]['filmID']}.json")
    with open(out, "w") as f:
        json.dump(faces, f)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
