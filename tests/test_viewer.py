"""Web viewer: endpoints, PreviewEngine round trip, settings persistence."""

import json
import os
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from raw2film_tpu.io.dng import write_dng
from raw2film_tpu.viewer import ViewerState, make_handler


@pytest.fixture
def server(tmp_path):
    rng = np.random.default_rng(0)
    for name in ("a.dng", "b.dng"):
        write_dng(
            str(tmp_path / name),
            rng.integers(2000, 40000, (40, 64)).astype(np.uint16),
            white_level=60000,
        )
    state = ViewerState(str(tmp_path))
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(state))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield base, state, str(tmp_path)
    httpd.shutdown()
    state.close()


def _get(url):
    with urllib.request.urlopen(url, timeout=60) as r:
        return r.status, r.headers.get_content_type(), r.read()


def _post(url, doc):
    req = urllib.request.Request(
        url, data=json.dumps(doc).encode(), method="POST"
    )
    with urllib.request.urlopen(req, timeout=60) as r:
        return json.loads(r.read())


class TestViewer:
    def test_page_and_images(self, server):
        base, _, _ = server
        code, ctype, body = _get(base + "/")
        assert code == 200 and ctype == "text/html" and b"raw2film-tpu" in body
        code, _, body = _get(base + "/api/images")
        doc = json.loads(body)
        assert doc["files"] == ["a.dng", "b.dng"]
        assert "Kodak Portra 400" in doc["negatives"]
        assert doc["prints"]

    def test_thumbnail(self, server):
        base, _, _ = server
        code, ctype, body = _get(base + "/api/thumb/0")
        assert code == 200 and ctype == "image/jpeg" and body[:2] == b"\xff\xd8"

    def test_params_to_frame_round_trip(self, server):
        base, state, folder = server
        out = _post(
            base + "/api/params",
            {"i": 0, "params": {"exp_comp": 0.5, "grain": 0}, "full": False},
        )
        assert out["ok"]
        code, _, body = _get(base + "/api/wait?since=0")
        doc = json.loads(body)
        assert doc["seq"] >= 1 and not doc.get("error"), doc
        code, ctype, jpg = _get(base + f"/api/frame.jpg?seq={doc['seq']}")
        assert code == 200 and jpg[:2] == b"\xff\xd8"
        code, ctype, png = _get(base + f"/api/hist.png?seq={doc['seq']}")
        assert code == 200 and png[:8] == b"\x89PNG\r\n\x1a\n"
        # Settings persisted to the folder sidecar, keyed by basename.
        sidecar = os.path.join(folder, "raw2film_settings.json")
        assert os.path.exists(sidecar)
        saved = json.load(open(sidecar))
        assert saved["images"]["a.dng"]["exp_comp"] == 0.5

    def test_bad_settings_reported_not_fatal(self, server):
        base, state, _ = server
        _post(
            base + "/api/params",
            {"i": 0, "params": {"exp_kelvin": -5.0}, "full": False},
        )
        _, _, body = _get(base + "/api/wait?since=0")
        doc = json.loads(body)
        assert doc["seq"] >= 1
        # Either the engine rejected it (error string) or rendered anyway;
        # the server must stay up either way.
        code, _, body = _get(base + "/api/images")
        assert code == 200
