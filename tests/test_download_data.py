"""Unit tests for the download CLI (mocked network).

Parity target: ``/root/reference/scripts/download_data.py`` — per-mouse
zip fetch + extract + cleanup, idempotent skip when the mouse directory
already exists, graceful old-mice back-fill skip without deeplake.
"""

from __future__ import annotations

import io
import zipfile

import numpy as np

from sensorium_tpu import constants
from sensorium_tpu.cli import download_data as dl


def make_zip_bytes(mouse: str) -> bytes:
    buffer = io.BytesIO()
    with zipfile.ZipFile(buffer, "w") as zf:
        zf.writestr(f"{mouse}/meta/trials/tiers.npy", b"fake")
        zf.writestr("__MACOSX/junk", b"")
    return buffer.getvalue()


def test_download_mouse_extracts_and_cleans_up(tmp_path, monkeypatch):
    mouse = constants.new_mice[0]
    urls = []

    def fake_download(url, dest):
        urls.append(url)
        dest.write_bytes(make_zip_bytes(mouse))

    monkeypatch.setattr(dl, "download_file", fake_download)
    dl.download_mouse(mouse, tmp_path)

    assert urls == [
        constants.dataset2url_format["new"].format(file_name=f"{mouse}.zip")
    ]
    assert (tmp_path / mouse / "meta" / "trials" / "tiers.npy").exists()
    assert not (tmp_path / f"{mouse}.zip").exists()  # zip removed
    assert not (tmp_path / "__MACOSX").exists()  # junk removed

    # Idempotent: an existing mouse dir skips the network entirely.
    dl.download_mouse(mouse, tmp_path)
    assert len(urls) == 1


def test_old_mouse_backfill_skips_without_deeplake(tmp_path, monkeypatch, capsys):
    mouse = constants.old_mice[0]

    monkeypatch.setattr(
        dl, "download_file", lambda url, dest: dest.write_bytes(make_zip_bytes(mouse))
    )
    import builtins

    real_import = builtins.__import__

    def no_deeplake(name, *args, **kwargs):
        if name == "deeplake":
            raise ImportError("mocked out")
        return real_import(name, *args, **kwargs)

    monkeypatch.setattr(builtins, "__import__", no_deeplake)
    dl.download_mouse(mouse, tmp_path)  # must not raise
    assert "skipping response back-fill" in capsys.readouterr().out


def test_backfill_writes_released_responses(tmp_path, monkeypatch):
    mouse = constants.old_mice[1]
    (tmp_path / mouse / "data" / "responses").mkdir(parents=True)

    class FakeColumn:
        def __init__(self, arrays):
            self._arrays = arrays

        def numpy(self):
            return np.asarray(self._arrays)

        def __getitem__(self, index):
            return FakeColumn(self._arrays[index])

    class FakeDataset:
        def __init__(self, trial_ids, responses):
            self.id = FakeColumn(np.asarray(trial_ids, dtype=np.int64)[:, None])
            self.responses = FakeColumn(responses)

    responses = np.arange(12, dtype=np.float32).reshape(2, 2, 3)
    fake = FakeDataset([7, 9], responses)

    import sys
    import types

    fake_module = types.ModuleType("deeplake")
    fake_module.load = lambda path: fake
    monkeypatch.setitem(sys.modules, "deeplake", fake_module)

    dl.backfill_old_mouse_responses(mouse, tmp_path / mouse)
    for i, trial_id in enumerate((7, 9)):
        saved = np.load(tmp_path / mouse / "data" / "responses" / f"{trial_id}.npy")
        np.testing.assert_array_equal(saved, responses[i])


def test_rerun_repairs_skipped_backfill(tmp_path, monkeypatch):
    """A back-fill skipped on the first run (no deeplake) must be repaired
    on rerun, not permanently lost to the mouse_dir-exists early-return."""
    mouse = constants.old_mice[0]
    mouse_dir = tmp_path / mouse
    (mouse_dir / "data" / "responses").mkdir(parents=True)
    (mouse_dir / "meta" / "trials").mkdir(parents=True)
    # Trial 0 labeled (has responses), trial 1 is an unlabeled-split tier
    # whose responses were never back-filled.
    tiers = np.array(["train", constants.unlabeled_splits[0]])
    np.save(mouse_dir / "meta" / "trials" / "tiers.npy", tiers)
    np.save(mouse_dir / "data" / "responses" / "0.npy", np.zeros(3, np.float32))

    assert dl.missing_backfill_trials(mouse_dir) == [1]

    calls = []
    monkeypatch.setattr(
        dl, "backfill_old_mouse_responses", lambda m, d: calls.append((m, d))
    )
    monkeypatch.setattr(
        dl, "download_file", lambda url, dest: (_ for _ in ()).throw(AssertionError)
    )
    dl.download_mouse(mouse, tmp_path)  # dir exists: no download, but repair
    assert calls == [(mouse, mouse_dir)]

    # Once the responses exist, a further rerun is a full no-op.
    np.save(mouse_dir / "data" / "responses" / "1.npy", np.zeros(3, np.float32))
    assert dl.missing_backfill_trials(mouse_dir) == []
    calls.clear()
    dl.download_mouse(mouse, tmp_path)
    assert calls == []
