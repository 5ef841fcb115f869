"""Model repository client + cache, against a local fixture server.

Parity: ``/root/reference/nequip/utils/model_repository.py`` +
``model_cache.py`` (the ``nequip.net:group/model:version`` scheme).  A
localhost HTTP server stands in for the repository (no egress needed).
"""

import http.server
import json
import os
import threading

import numpy as np
import pytest

ARTIFACT_BYTES = b"PK\x03\x04 fake model package payload"


class _RepoHandler(http.server.BaseHTTPRequestHandler):
    def log_message(self, *a):  # silence
        pass

    def do_GET(self):
        if self.path.startswith("/api/models/download/"):
            model_id = self.path.rsplit("/", 1)[1]
            if "missing" in model_id:
                self.send_response(404)
                self.end_headers()
                return
            body = json.dumps(
                {
                    "modelId": "test-org/test-model:v1",
                    "newerVersionId": "test-org/test-model:v2",
                    "webUrl": "http://example/web",
                    "artifact": {
                        "downloadUrl": "/artifacts/test-model-v1.zip",
                        "viewUrl": "http://example/view",
                        "hostName": "fixture",
                        "doi": "10.0000/fake",
                    },
                }
            ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(body)
        elif self.path.startswith("/artifacts/"):
            self.send_response(200)
            self.end_headers()
            self.wfile.write(ARTIFACT_BYTES)
        else:
            self.send_response(404)
            self.end_headers()


@pytest.fixture()
def repo_server():
    server = http.server.HTTPServer(("127.0.0.1", 0), _RepoHandler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_port}"
    server.shutdown()


def test_client_info_and_download(repo_server, tmp_path):
    from nequip_tpu.utils.model_repository import (
        ModelNotFoundError,
        NequIPNetAPIClient,
    )

    client = NequIPNetAPIClient(base_url=repo_server)
    info = client.get_model_download_info("test-org/test-model:v1")
    assert info.model_id == "test-org/test-model:v1"
    assert info.newer_version_id == "test-org/test-model:v2"
    assert info.artifact.doi == "10.0000/fake"

    dest = str(tmp_path / "m.zip")
    client.download_model("test-org/test-model:v1", dest)
    assert open(dest, "rb").read() == ARTIFACT_BYTES

    with pytest.raises(ModelNotFoundError):
        client.get_model_download_info("test-org/missing-model:v1")
    with pytest.raises(ValueError, match="Invalid model_id"):
        client.get_model_download_info("not a valid id")


def test_resolve_model_id_downloads_and_caches(repo_server, tmp_path, monkeypatch):
    from nequip_tpu.utils.model_cache import model_id_to_path, resolve_model_id
    from nequip_tpu.utils.model_repository import REPOSITORY_URL_ENV

    monkeypatch.setenv("NEQUIP_CACHE_DIR", str(tmp_path / "cache"))
    monkeypatch.setenv(REPOSITORY_URL_ENV, repo_server)

    mid = "nequip.net:test-org/test-model:v1"
    path = resolve_model_id(mid)
    assert path == model_id_to_path(mid)
    assert open(path, "rb").read() == ARTIFACT_BYTES

    # cache hit: works even with the repository unreachable
    monkeypatch.setenv(REPOSITORY_URL_ENV, "http://127.0.0.1:1")
    assert resolve_model_id(mid) == path


def test_resolve_model_id_offline_error(tmp_path, monkeypatch):
    from nequip_tpu.utils.model_cache import resolve_model_id
    from nequip_tpu.utils.model_repository import REPOSITORY_URL_ENV

    monkeypatch.setenv("NEQUIP_CACHE_DIR", str(tmp_path / "cache"))
    monkeypatch.setenv(REPOSITORY_URL_ENV, "http://127.0.0.1:1")
    with pytest.raises(FileNotFoundError, match="unreachable"):
        resolve_model_id("nequip.net:test-org/test-model:v9")
