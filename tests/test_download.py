"""Download-on-miss tests (reference: fad.py:95-106, 275-286) — hermetic via
file:// URLs; no network is touched."""

import hashlib
import os
import pathlib

import numpy as np
import pytest

from frechet_audio_distance_exported_tpu import registry
from frechet_audio_distance_exported_tpu.utils import download as dl
from frechet_audio_distance_exported_tpu.utils import weights as weight_store


@pytest.fixture
def online(monkeypatch):
    monkeypatch.delenv("FAD_TPU_OFFLINE", raising=False)


def _file_url(path) -> str:
    return pathlib.Path(path).as_uri()


class TestDownloader:
    def test_offline_refuses(self, tmp_path, monkeypatch):
        monkeypatch.setenv("FAD_TPU_OFFLINE", "1")
        with pytest.raises(RuntimeError, match="FAD_TPU_OFFLINE"):
            dl.download_url_to_file("file:///nonexistent", str(tmp_path / "x"))

    def test_roundtrip_and_sha256(self, tmp_path, online):
        src = tmp_path / "src.bin"
        payload = os.urandom(4096) * 3
        src.write_bytes(payload)
        dst = tmp_path / "sub" / "dst.bin"
        out = dl.download_url_to_file(
            _file_url(src), str(dst), progress=False,
            sha256=hashlib.sha256(payload).hexdigest(),
        )
        assert out == str(dst)
        assert dst.read_bytes() == payload
        # No leftover .part temp files.
        assert not list(dst.parent.glob("*.part"))

    def test_sha256_mismatch_rejects_and_cleans_up(self, tmp_path, online):
        src = tmp_path / "src.bin"
        src.write_bytes(b"hello world")
        dst = tmp_path / "dst.bin"
        with pytest.raises(RuntimeError, match="sha256 mismatch"):
            dl.download_url_to_file(_file_url(src), str(dst), progress=False, sha256="0" * 64)
        assert not dst.exists()
        assert not list(tmp_path.glob("*.part"))


class TestGetParamsDownloadOnMiss:
    def test_bundle_url_download(self, tmp_path, online, monkeypatch):
        """A hosted .npz bundle URL satisfies a cache miss torch-free."""
        # Build a real bundle from random init and host it at a file:// URL.
        params = weight_store.init_random_params("vggish", seed=3)
        hosted = tmp_path / "hosted" / registry.WEIGHT_FILENAMES["vggish"]
        weight_store.save_weights(str(hosted), params)
        monkeypatch.setitem(registry.WEIGHT_BUNDLE_URLS, "vggish", _file_url(hosted))

        ckpt_dir = tmp_path / "ckpt"
        ckpt_dir.mkdir()
        got = weight_store.get_params("vggish", str(ckpt_dir), weights="auto")
        # Bundle was cached into ckpt_dir and loads to the same pytree.
        assert (ckpt_dir / registry.WEIGHT_FILENAMES["vggish"]).exists()
        flat_a = weight_store.flatten_params(params)
        flat_b = weight_store.flatten_params(got)
        assert flat_a.keys() == flat_b.keys()
        for k in flat_a:
            np.testing.assert_array_equal(np.asarray(flat_a[k]), np.asarray(flat_b[k]))

    def test_urls_cover_all_models(self):
        assert set(registry.EXPORTED_MODEL_URLS) == set(registry.VALID_MODELS)

    def test_offline_miss_message(self, tmp_path, monkeypatch):
        monkeypatch.setenv("FAD_TPU_OFFLINE", "1")
        with pytest.raises(FileNotFoundError, match="FAD_TPU_OFFLINE"):
            weight_store.get_params("vggish", str(tmp_path), weights="auto")

    def test_failed_download_reported(self, tmp_path, online, monkeypatch):
        """A dead URL falls through to a FileNotFoundError naming the failure."""
        monkeypatch.setitem(
            registry.EXPORTED_MODEL_URLS, "vggish",
            _file_url(tmp_path / "missing.pt2"),
        )
        with pytest.raises(FileNotFoundError, match="Download attempts failed"):
            weight_store.get_params("vggish", str(tmp_path), weights="auto")
