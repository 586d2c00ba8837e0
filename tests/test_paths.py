"""Azure-aware path localization (utils/paths.py): parity surface for the
reference's dpu_utils RichPath data paths (reference train.py:61-72)."""

import io
import json
import os

import pytest

from tf_gnn_samples_tpu.utils.paths import (
    is_azure_path,
    localize_path,
    parse_azure_path,
)


class _FakeBlob:
    def __init__(self, name, data):
        self.name = name
        self.size = len(data)
        self.data = data


class _FakeDownload:
    def __init__(self, data):
        self._data = data

    def readall(self):
        return self._data


class _FakeContainerClient:
    def __init__(self, blobs):
        self._blobs = blobs
        self.download_calls = 0

    def list_blobs(self, name_starts_with=""):
        return [b for b in self._blobs if b.name.startswith(name_starts_with)]

    def download_blob(self, name):
        self.download_calls += 1
        for b in self._blobs:
            if b.name == name:
                return _FakeDownload(b.data)
        raise KeyError(name)


def test_parse_and_detect():
    assert not is_azure_path("/local/dir")
    assert is_azure_path("azure://acct/cont/some/prefix")
    assert parse_azure_path("azure://acct/cont/some/prefix") == (
        "acct", "cont", "some/prefix"
    )
    assert parse_azure_path("azure://acct/cont") == ("acct", "cont", "")
    with pytest.raises(ValueError):
        parse_azure_path("azure://only-account")


def test_local_paths_pass_through(tmp_path):
    p = str(tmp_path / "data")
    assert localize_path(p, None) == p


def test_localize_prefix_downloads_and_caches(tmp_path):
    auth_file = tmp_path / "azure_auth.json"
    cache = tmp_path / "cache"
    auth_file.write_text(json.dumps({
        "acct": {"sas_token": "tok", "cache_location": str(cache)}
    }))
    blobs = [
        _FakeBlob("qm9/train.jsonl.gz", b"train-bytes"),
        _FakeBlob("qm9/valid.jsonl.gz", b"valid-bytes-longer"),
        _FakeBlob("other/skip.bin", b"x"),
    ]
    client = _FakeContainerClient(blobs)

    def factory(account, container, auth):
        assert account == "acct" and container == "cont"
        assert auth["sas_token"] == "tok"
        return client

    local = localize_path("azure://acct/cont/qm9", str(auth_file),
                          container_client_factory=factory)
    assert os.path.isdir(local)
    assert open(os.path.join(local, "train.jsonl.gz"), "rb").read() == b"train-bytes"
    assert open(os.path.join(local, "valid.jsonl.gz"), "rb").read() == b"valid-bytes-longer"
    assert not os.path.exists(os.path.join(local, "skip.bin"))
    assert client.download_calls == 2

    # Second call: cache hit (size match), no re-download.
    local2 = localize_path("azure://acct/cont/qm9", str(auth_file),
                           container_client_factory=factory)
    assert local2 == local
    assert client.download_calls == 2


def test_missing_auth_and_account_errors(tmp_path):
    with pytest.raises(FileNotFoundError):
        localize_path("azure://acct/cont/x", str(tmp_path / "nope.json"),
                      container_client_factory=lambda *a: None)
    auth_file = tmp_path / "auth.json"
    auth_file.write_text(json.dumps({"other": {}}))
    with pytest.raises(KeyError):
        localize_path("azure://acct/cont/x", str(auth_file),
                      container_client_factory=lambda *a: None)
