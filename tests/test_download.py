"""Offline-logic tests for the dev-dataset downloaders (the network
paths themselves need egress; these pin the idempotent-skip, partial-file
cleanup, and CLI-gating behaviors the reference relies on —
reference src/pd_fusion/data/download/*.py)."""
import urllib.request
from pathlib import Path

import pytest

from pd_fusion.data.download import download_manager, openneuro_download, uci_download


def test_uci_fetch_skips_existing_without_network(tmp_path, monkeypatch):
    dest = tmp_path / "uci" / "parkinsons.data"
    dest.parent.mkdir(parents=True)
    dest.write_text("cached")

    def _no_network(*a, **k):  # pragma: no cover - must never run
        raise AssertionError("network touched despite existing file")

    monkeypatch.setattr(urllib.request, "urlopen", _no_network)
    uci_download.fetch("http://example.invalid/x", dest)
    assert dest.read_text() == "cached"


def test_uci_fetch_failure_leaves_no_partial_file(tmp_path, monkeypatch):
    dest = tmp_path / "uci" / "parkinsons.data"

    class _Resp:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def read(self, n):
            raise OSError("connection reset mid-stream")

    monkeypatch.setattr(urllib.request, "urlopen", lambda *a, **k: _Resp())
    with pytest.raises(OSError):
        uci_download.fetch("http://example.invalid/x", dest)
    assert not dest.exists()  # partial file cleaned up


def test_openneuro_skips_when_cli_missing(tmp_path, monkeypatch):
    import shutil as _shutil

    monkeypatch.setattr(_shutil, "which", lambda name: None)
    # must return quietly without attempting any accession
    openneuro_download.download_openneuro_datasets(tmp_path)
    assert not (tmp_path / "openneuro").exists()


def test_openneuro_fetch_accession_skips_existing(tmp_path, monkeypatch):
    import subprocess as _subprocess

    target = tmp_path / "ds001907"
    target.mkdir(parents=True)

    def _no_subprocess(*a, **k):  # pragma: no cover - must never run
        raise AssertionError("subprocess spawned despite existing dataset")

    monkeypatch.setattr(_subprocess, "run", _no_subprocess)
    openneuro_download.fetch_accession("ds001907", tmp_path)


def test_openneuro_metadata_only_builds_include_filters(tmp_path, monkeypatch):
    import subprocess as _subprocess

    seen = {}

    def _capture(cmd, check):
        seen["cmd"] = cmd

    monkeypatch.setattr(_subprocess, "run", _capture)
    openneuro_download.fetch_accession("ds004471", tmp_path, metadata_only=True)
    cmd = seen["cmd"]
    assert cmd[:3] == ["openneuro", "download", "ds004471"]
    for name in openneuro_download.METADATA_FILES:
        assert name in cmd


def test_manual_instructions_list_restricted_sources(capsys):
    download_manager.print_manual_instructions()
    out = capsys.readouterr().out
    assert "Synapse" in out and "BioFIND" in out
    assert "data/raw_dev/synapse/" in out
